"""Serving runtime: native stream multiplexer + continuous service loop.

The reference library is a per-frame, single-threaded C++ library whose
scaling story is one tracker instance per thread (reference:
docs/guides/architecture.md:246-258). The TPU-native serving story is
the inverse shape: threads only queue frames (native C++ mux,
native/motcpp_mux.cpp), and one device steps all streams at once as a
batched SPMD step, with masked state selection giving exact per-stream
semantics under irregular frame arrival.
"""

from motcpp_tpu.serving.mux import (  # noqa: F401
    PyStreamMux,
    StreamMux,
    create_mux,
    native_available,
)
from motcpp_tpu.serving.service import (  # noqa: F401
    ServedBatch,
    StreamHandle,
    TrackingService,
    make_service_step,
)
