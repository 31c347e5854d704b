"""Camera-motion compensation: ECC and sparse optical flow.

Host/TPU split: CMC is inherently an image-registration problem over
consecutive frames. We provide three estimators, all returning the
reference's (2, 3) affine warp contract (identity on failure):

  * :class:`ECC` — faithful port of the reference's enhanced-correlation
    alignment (reference: src/motion/cmc/{cmc,ecc}.cpp): grayscale +
    0.15x downscale preprocessing, cv2.findTransformECC with
    MOTION_TRANSLATION, translation rescaled by 1/scale, identity on
    non-convergence. Requires OpenCV (IO layer only — never the compute
    path).
  * :class:`SOF` — faithful sparse-optical-flow port (reference:
    src/motion/cmc/sof.cpp): goodFeaturesToTrack (1000 corners,
    quality 0.01) + cornerSubPix + pyramidal LK (21x21, 3 levels) +
    estimateAffinePartial2D RANSAC; < 4 valid points -> identity and
    re-detect.
  * :class:`SOFJax` — TPU-native estimator: Harris-corner scoring +
    multi-scale Lucas-Kanade on a fixed grid of the strongest corners +
    least-squares partial-affine fit with one residual-trim pass, all in
    jnp (fixed shapes, jittable). This is the estimator used when
    OpenCV is unavailable or ``prefer_jax`` is set.
  * :class:`ECCJax` / :func:`ecc_jax_batch` — TPU-native ECC
    (translation model, like the reference's MOTION_TRANSLATION
    default, ecc.cpp:36): phase-correlation initialisation (FFT cross
    power spectrum, robust to large shifts the Gauss-Newton basin would
    miss) + fixed-iteration ECC refinement (Evangelidis-Psarakis
    zero-mean-correlation Gauss-Newton) for sub-pixel accuracy, all
    jnp/jittable. ``ecc_jax_batch`` vmaps the core over a stream axis
    so serving estimates every stream's warp in ONE device pass — the
    reference runs cv2.findTransformECC per frame per tracker on the
    host (ecc.cpp:22-98).

Precomputed warps can always be injected directly at the tracker API
(``tracker.update(..., warp=...)`` via the functional cores), matching
how the reference allows precomputed embeddings.
"""

from __future__ import annotations

import functools

import numpy as np

IDENTITY = np.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)


def _to_gray(img):
    img = np.asarray(img)
    if img.ndim == 2:
        return img.astype(np.float32)
    # BGR weights (reference converts with cv2.cvtColor BGR2GRAY)
    return (
        0.114 * img[..., 0] + 0.587 * img[..., 1] + 0.299 * img[..., 2]
    ).astype(np.float32)


class ECC:
    """Enhanced-correlation-coefficient alignment (translation model)."""

    def __init__(self, scale: float = 0.15, max_iter: int = 100, eps: float = 1e-5):
        self.scale = scale
        self.max_iter = max_iter
        self.eps = eps
        self._prev = None

    def apply(self, img, dets=None) -> np.ndarray:
        try:
            import cv2
        except ImportError:
            return IDENTITY.copy()
        gray = _to_gray(img).astype(np.uint8)
        small = cv2.resize(gray, None, fx=self.scale, fy=self.scale)
        if self._prev is None:
            self._prev = small
            return IDENTITY.copy()
        warp = np.eye(2, 3, dtype=np.float32)
        try:
            criteria = (
                cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT,
                self.max_iter,
                self.eps,
            )
            _, warp = cv2.findTransformECC(
                self._prev, small, warp, cv2.MOTION_TRANSLATION, criteria
            )
            warp = warp.copy()
            warp[:, 2] /= self.scale  # rescale translation (ecc.cpp:70-80)
        except cv2.error:
            warp = IDENTITY.copy()  # StsNoConv -> identity (ecc.cpp:83-90)
        self._prev = small
        return warp.astype(np.float32)

    def reset(self):
        self._prev = None


class SOF:
    """Sparse-optical-flow alignment (reference: sof.cpp:24-180)."""

    def __init__(self, scale: float = 0.15):
        self.scale = scale
        self._prev = None
        self._prev_pts = None

    @staticmethod
    def _detect(cv2, gray):
        """goodFeaturesToTrack + sub-pixel refinement (the reference
        refines every corner set: sof.cpp:47,105,165 — cornerSubPix with
        a 5x5 window, 30-iteration / 0.01-eps criteria)."""
        pts = cv2.goodFeaturesToTrack(
            gray, maxCorners=1000, qualityLevel=0.01, minDistance=1
        )
        if pts is not None and len(pts) > 0:
            criteria = (
                cv2.TERM_CRITERIA_COUNT | cv2.TERM_CRITERIA_EPS, 30, 0.01
            )
            pts = cv2.cornerSubPix(gray, pts, (5, 5), (-1, -1), criteria)
        return pts

    def apply(self, img, dets=None) -> np.ndarray:
        try:
            import cv2
        except ImportError:
            return SOFJax().apply(img, dets)
        gray = _to_gray(img).astype(np.uint8)
        if self.scale != 1.0:
            gray = cv2.resize(gray, None, fx=self.scale, fy=self.scale)
        if self._prev is None:
            self._prev = gray
            self._prev_pts = self._detect(cv2, gray)
            return IDENTITY.copy()
        warp = IDENTITY.copy()
        pts = self._prev_pts
        if pts is not None and len(pts) >= 4:
            nxt, st, _ = cv2.calcOpticalFlowPyrLK(
                self._prev, gray, pts, None,
                winSize=(21, 21), maxLevel=3,
            )
            good = st.reshape(-1) == 1
            if good.sum() >= 4:
                m, _ = cv2.estimateAffinePartial2D(
                    pts[good], nxt[good], method=cv2.RANSAC
                )
                if m is not None:
                    warp = m.astype(np.float32)
                    warp[:, 2] /= self.scale
        self._prev = gray
        self._prev_pts = self._detect(cv2, gray)
        return warp

    def reset(self):
        self._prev = None
        self._prev_pts = None


# ---------------------------------------------------------------------------
# TPU-native estimator
# ---------------------------------------------------------------------------


@functools.partial(
    __import__("jax").jit, static_argnames=("n_corners", "win", "levels")
)
def _sof_jax_core(prev, cur, n_corners=256, win=10, levels=3):
    """Harris corners on prev + pyramidal LK to cur + LS partial affine.

    prev/cur: (H, W) float32 grayscale. Returns ((2,3) warp, ok flag).
    """
    import jax
    import jax.numpy as jnp

    def gradients(im):
        gx = (jnp.roll(im, -1, 1) - jnp.roll(im, 1, 1)) * 0.5
        gy = (jnp.roll(im, -1, 0) - jnp.roll(im, 1, 0)) * 0.5
        return gx, gy

    def box_blur(im, r=2):
        k = 2 * r + 1
        im = jnp.cumsum(im, axis=0)
        im = (jnp.roll(im, -r, 0) - jnp.roll(im, r + 1, 0)) / k
        im = jnp.cumsum(im, axis=1)
        im = (jnp.roll(im, -r, 1) - jnp.roll(im, r + 1, 1)) / k
        return im

    H, W = prev.shape
    gx, gy = gradients(prev)
    ixx = box_blur(gx * gx)
    iyy = box_blur(gy * gy)
    ixy = box_blur(gx * gy)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    harris = det - 0.04 * tr * tr
    # suppress borders
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    margin = win + 2
    border = (yy < margin) | (yy >= H - margin) | (xx < margin) | (xx >= W - margin)
    harris = jnp.where(border, -jnp.inf, harris)
    flat = harris.reshape(-1)
    top = jax.lax.top_k(flat, n_corners)[1]
    cy = (top // W).astype(jnp.float32)
    cx = (top % W).astype(jnp.float32)

    def bilinear(im, ys, xs):
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        wy = ys - y0
        wx = xs - x0
        y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
        y1i = jnp.clip(y0i + 1, 0, H - 1)
        x1i = jnp.clip(x0i + 1, 0, W - 1)
        return (
            im[y0i, x0i] * (1 - wy) * (1 - wx)
            + im[y0i, x1i] * (1 - wy) * wx
            + im[y1i, x0i] * wy * (1 - wx)
            + im[y1i, x1i] * wy * wx
        )

    cgx, cgy = gradients(cur)
    offs = jnp.arange(-win, win + 1, dtype=jnp.float32)
    oy = jnp.tile(offs[:, None], (1, 2 * win + 1)).reshape(-1)
    ox = jnp.tile(offs[None, :], (2 * win + 1, 1)).reshape(-1)

    def lk_level(disp, scale_factor):
        """One LK iteration set at a pyramid scale (coarse-to-fine)."""
        dy, dx = disp
        ys = cy[:, None] + oy[None, :]
        xs = cx[:, None] + ox[None, :]
        # template from prev at corner, patch from cur at corner + disp
        t = bilinear(prev, ys, xs)

        def iterate(carry, _):
            dy, dx = carry
            ys2 = ys + dy[:, None]
            xs2 = xs + dx[:, None]
            i = bilinear(cur, ys2, xs2)
            gx_p = bilinear(cgx, ys2, xs2)
            gy_p = bilinear(cgy, ys2, xs2)
            err = t - i
            a11 = jnp.sum(gx_p * gx_p, 1) + 1e-6
            a12 = jnp.sum(gx_p * gy_p, 1)
            a22 = jnp.sum(gy_p * gy_p, 1) + 1e-6
            b1 = jnp.sum(gx_p * err, 1)
            b2 = jnp.sum(gy_p * err, 1)
            detA = a11 * a22 - a12 * a12
            ddx = (a22 * b1 - a12 * b2) / detA
            ddy = (a11 * b2 - a12 * b1) / detA
            return (dy + ddy, dx + ddx), None

        (dy, dx), _ = jax.lax.scan(iterate, (dy, dx), None, length=5)
        return dy, dx

    dy = jnp.zeros_like(cy)
    dx = jnp.zeros_like(cx)
    for _ in range(levels):
        dy, dx = lk_level((dy, dx), 1.0)

    # validity: small residual + reasonable displacement
    ys2 = cy[:, None] + oy[None, :] + dy[:, None]
    xs2 = cx[:, None] + ox[None, :] + dx[:, None]
    t = bilinear(prev, cy[:, None] + oy[None, :], cx[:, None] + ox[None, :])
    i = bilinear(cur, ys2, xs2)
    resid = jnp.mean(jnp.abs(t - i), axis=1)
    disp = jnp.sqrt(dy * dy + dx * dx)
    ok = (resid < 10.0) & (disp < 0.2 * jnp.float32(max(H, W)))

    # least-squares partial affine [a, -b, tx; b, a, ty] on valid points
    def fit(mask):
        wgt = mask.astype(jnp.float32)
        n = jnp.sum(wgt) + 1e-6
        px = cx
        py = cy
        qx = cx + dx
        qy = cy + dy
        mpx = jnp.sum(wgt * px) / n
        mpy = jnp.sum(wgt * py) / n
        mqx = jnp.sum(wgt * qx) / n
        mqy = jnp.sum(wgt * qy) / n
        cpx = px - mpx
        cpy = py - mpy
        cqx = qx - mqx
        cqy = qy - mqy
        sxx = jnp.sum(wgt * (cpx * cqx + cpy * cqy))
        sxy = jnp.sum(wgt * (cpx * cqy - cpy * cqx))
        d = jnp.sum(wgt * (cpx * cpx + cpy * cpy)) + 1e-6
        a = sxx / d
        b = sxy / d
        tx = mqx - (a * mpx - b * mpy)
        ty = mqy - (b * mpx + a * mpy)
        return a, b, tx, ty

    a, b, tx, ty = fit(ok)
    # one residual trim pass (RANSAC-lite)
    rx = (a * cx - b * cy + tx) - (cx + dx)
    ry = (b * cx + a * cy + ty) - (cy + dy)
    r = jnp.sqrt(rx * rx + ry * ry)
    ok2 = ok & (r < jnp.maximum(2.0, 2.0 * jnp.median(jnp.where(ok, r, 1e3))))
    a, b, tx, ty = fit(ok2)

    enough = jnp.sum(ok2.astype(jnp.int32)) >= 4
    import jax.numpy as jnp2

    warp = jnp2.asarray([[a, -b, tx], [b, a, ty]], jnp2.float32)
    ident = jnp2.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp2.float32)
    return jnp2.where(enough, warp, ident), enough


def sof_jax_batch(prev, cur, n_corners: int = 256, win: int = 10,
                  levels: int = 3):
    """Batched camera-motion estimation: (S, H, W) grayscale pairs ->
    ((S, 2, 3) partial-affine warps, (S,) ok flags) in ONE device pass.

    The reference's CMC is per-frame CPU cv2 (reference: src/motion/
    cmc/sof.cpp); this vmaps the SOFJax core (Harris + pyramidal LK +
    least-squares partial affine) over the stream axis, so serving
    many moving-camera streams estimates every warp in a single
    fixed-shape XLA program. Streams whose fit fails get the identity
    warp and ok=False.
    """
    import jax

    f = jax.vmap(
        functools.partial(
            _sof_jax_core, n_corners=n_corners, win=win, levels=levels
        )
    )
    return f(prev, cur)


@functools.partial(__import__("jax").jit, static_argnames=("n_iters",))
def _ecc_jax_core(prev, cur, n_iters: int = 8):
    """Translation-only ECC alignment of one grayscale pair.

    prev/cur: (H, W) float32 (already at CMC scale). Returns
    ((2, 3) translation warp mapping prev coords -> cur coords,
    ok flag). Mirrors the reference's cv2.findTransformECC with
    MOTION_TRANSLATION (reference: src/motion/cmc/ecc.cpp:22-98) —
    the warp W satisfies cur(W(x)) ~= prev(x) — but runs entirely
    on-device with fixed shapes:

      1. phase correlation (FFT cross-power spectrum) gives an integer
         shift estimate robust to motion far outside Gauss-Newton's
         convergence basin (cv2's ECC simply fails there and the
         reference falls back to identity, ecc.cpp:83-90);
      2. ``n_iters`` ECC iterations (zero-mean correlation objective,
         forward-additive Gauss-Newton) refine to sub-pixel. The init
         lands within ~0.5px, so the default 8 iterations are pure
         sub-pixel polish (the step-norm freeze makes extra iterations
         no-ops once converged).

    Non-convergence / flat-image degeneracy -> identity + ok=False,
    the reference's StsNoConv contract.
    """
    import jax
    import jax.numpy as jnp

    H, W = prev.shape
    prev = prev.astype(jnp.float32)
    cur = cur.astype(jnp.float32)

    # --- phase-correlation init (Hann-windowed to kill edge ringing) ---
    wy = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(H) / H)
    wx = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(W) / W)
    win = wy[:, None] * wx[None, :]
    f1 = jnp.fft.rfft2((prev - prev.mean()) * win)
    f2 = jnp.fft.rfft2((cur - cur.mean()) * win)
    xps = f1 * jnp.conj(f2)
    xps = xps / (jnp.abs(xps) + 1e-9)
    corr = jnp.fft.irfft2(xps, s=(H, W))
    peak = jnp.argmax(corr)
    py = (peak // W).astype(jnp.float32)
    px = (peak % W).astype(jnp.float32)
    # wrap-around: indices past the midpoint are negative shifts
    py = jnp.where(py > H / 2, py - H, py)
    px = jnp.where(px > W / 2, px - W, px)
    # correlation peaks at index (-p mod N) for cur = prev shifted by +p
    tx0, ty0 = -px, -py

    # --- ECC refinement over the interior (static margin avoids the
    # zero-filled borders translation drags in) ---
    #
    # TPU note: the warp is translation-only, so the sampling decomposes
    # into (a) the INTEGER phase-correlation shift, applied once up
    # front as a dynamic jnp.roll that aligns cur to prev (the band the
    # roll wraps in is masked out of every reduction below), and (b) a
    # small sub-pixel RESIDUAL refined by Gauss-Newton, whose bilinear
    # resample of the regular interior grid is exactly four
    # lax.dynamic_slice windows blended by the fractional part. No
    # per-pixel gathers anywhere: the first cut of this kernel indexed
    # im[y0i, x0i] with (H, W) index matrices, and vmapped over S=512
    # streams inside the 30-iteration scan those gathers faulted the
    # TPU worker (BENCH_r04 rc=1, bench.py _cmc_ecc leg).
    m = 8
    ih, iw_n = H - 2 * m, W - 2 * m  # interior window size (static)
    res_max = float(m - 2)  # residual GN clamp keeps slices in range

    ti_y = jnp.round(ty0).astype(jnp.int32)
    ti_x = jnp.round(tx0).astype(jnp.int32)
    # align cur to prev by the integer shift:
    # cur_al(y, x) = cur(y + ti_y, x + ti_x) where in-bounds
    cur_al = jnp.roll(jnp.roll(cur, -ti_y, 0), -ti_x, 1)
    # validity of the aligned interior, eroded by the residual clamp so
    # the mask stays conservative for every GN iterate; the extra 1px
    # ring erosion covers the window-internal gradient stencil below
    yy = jnp.arange(m, H - m)
    xx = jnp.arange(m, W - m)
    vy = ((yy + ti_y) >= m) & ((yy + ti_y) <= H - 1 - m)
    vy = vy & (yy > m) & (yy < H - 1 - m)
    vx = ((xx + ti_x) >= m) & ((xx + ti_x) <= W - 1 - m)
    vx = vx & (xx > m) & (xx < W - 1 - m)
    wgt = (vy[:, None] & vx[None, :]).astype(jnp.float32)
    n_w = jnp.sum(wgt) + 1e-9

    def sample_interior(im, ry, rx):
        """Bilinear sample of aligned im at the interior grid + (ry, rx),
        |r| <= res_max < m, via 4 dynamic-slice windows."""
        y0 = jnp.floor(ry)
        x0 = jnp.floor(rx)
        fy = ry - y0
        fx = rx - x0
        sy = m + y0.astype(jnp.int32)
        sx = m + x0.astype(jnp.int32)

        def win(dy, dx):
            return jax.lax.dynamic_slice(im, (sy + dy, sx + dx), (ih, iw_n))

        return (
            win(0, 0) * (1 - fy) * (1 - fx)
            + win(0, 1) * (1 - fy) * fx
            + win(1, 0) * fy * (1 - fx)
            + win(1, 1) * fy * fx
        )

    tmpl = prev[m:H - m, m:W - m]
    tbar = (tmpl - jnp.sum(wgt * tmpl) / n_w) * wgt
    t_norm2 = jnp.sum(tbar * tbar)

    def ecc_iter(carry, _):
        rx, ry, frozen = carry
        iw = sample_interior(cur_al, ry, rx)
        # image gradients by central differences WITHIN the sampled
        # window (the wgt ring erosion masks the 1px wrap band): one
        # resample pass instead of three — gradients of the bilinear
        # resample converge to the same fixed point as resampled
        # gradients (standard LK practice)
        gxw = (jnp.roll(iw, -1, 1) - jnp.roll(iw, 1, 1)) * 0.5
        gyw = (jnp.roll(iw, -1, 0) - jnp.roll(iw, 1, 0)) * 0.5
        # zero-mean over the VALID support only (masked reductions)
        ibar = (iw - jnp.sum(wgt * iw) / n_w) * wgt
        gxb = (gxw - jnp.sum(wgt * gxw) / n_w) * wgt
        gyb = (gyw - jnp.sum(wgt * gyw) / n_w) * wgt
        # 2x2 Gram of the (zero-mean) translation Jacobian columns
        c11 = jnp.sum(gxb * gxb) + 1e-9
        c12 = jnp.sum(gxb * gyb)
        c22 = jnp.sum(gyb * gyb) + 1e-9
        detc = c11 * c22 - c12 * c12
        iv1 = jnp.sum(gxb * ibar)
        iv2 = jnp.sum(gyb * ibar)
        tv1 = jnp.sum(gxb * tbar)
        tv2 = jnp.sum(gyb * tbar)

        def cinv(v1, v2):
            return ((c22 * v1 - c12 * v2) / detc,
                    (c11 * v2 - c12 * v1) / detc)

        ci1, ci2 = cinv(iv1, iv2)
        i_norm2 = jnp.sum(ibar * ibar)
        num = i_norm2 - (iv1 * ci1 + iv2 * ci2)
        den = jnp.sum(tbar * ibar) - (tv1 * ci1 + tv2 * ci2)
        # den <= 0 is ECC's "cannot increase correlation" failure; hold
        lam = num / jnp.where(den > 1e-9, den, 1.0)
        err1 = lam * tv1 - iv1
        err2 = lam * tv2 - iv2
        d1, d2 = cinv(err1, err2)
        step_ok = (den > 1e-9) & jnp.isfinite(d1) & jnp.isfinite(d2)
        upd = step_ok & ~frozen
        rx = jnp.clip(jnp.where(upd, rx + d1, rx), -res_max, res_max)
        ry = jnp.clip(jnp.where(upd, ry + d2, ry), -res_max, res_max)
        # eps-convergence freeze (the reference's TERM_CRITERIA_EPS 1e-5
        # is on the correlation delta; a step-norm freeze is the same
        # fixed point and keeps the scan branch-free)
        frozen = frozen | (jnp.sqrt(d1 * d1 + d2 * d2) < 1e-4) | ~step_ok
        rho = jnp.sum(tbar * ibar) / (
            jnp.sqrt(t_norm2 * i_norm2) + 1e-9
        )
        return (rx, ry, frozen), rho

    r0 = (tx0 - ti_x.astype(jnp.float32), ty0 - ti_y.astype(jnp.float32))
    (rx, ry, _), rhos = jax.lax.scan(
        ecc_iter, (r0[0], r0[1], jnp.bool_(False)), None, length=n_iters
    )
    rho = rhos[-1]
    tx = ti_x.astype(jnp.float32) + rx
    ty = ti_y.astype(jnp.float32) + ry
    ok = (
        jnp.isfinite(tx) & jnp.isfinite(ty)
        & (rho > 0.2)
        & (jnp.abs(tx) < 0.5 * W) & (jnp.abs(ty) < 0.5 * H)
        # enough valid overlap for the masked statistics to mean anything
        & (n_w > 0.25 * ih * iw_n)
    )
    warp = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32
    ) + jnp.zeros((2, 3), jnp.float32).at[0, 2].set(tx).at[1, 2].set(ty)
    ident = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    return jnp.where(ok, warp, ident), ok


def ecc_jax_batch(prev, cur, n_iters: int = 8):
    """Batched translation-ECC: (S, H, W) grayscale pairs ->
    ((S, 2, 3) warps, (S,) ok flags) in ONE device pass.

    TPU-native counterpart of the reference's per-frame host
    cv2.findTransformECC loop (reference: src/motion/cmc/ecc.cpp:22-98)
    and the ECC analogue of :func:`sof_jax_batch`: ECC is the default
    CMC for StrongSORT/BoostTrack, so at thousands of streams the warp
    estimate must ride the chip with the rest of the tick. Streams that
    fail to converge get the identity warp and ok=False.
    """
    import jax

    f = jax.vmap(functools.partial(_ecc_jax_core, n_iters=n_iters))
    return f(prev, cur)


class ECCJax:
    """TPU-native ECC CMC (translation model; see module doc).

    Drop-in for :class:`ECC`: same (2, 3) warp contract, same 0.15x
    downscale preprocessing and 1/scale translation rescale
    (reference: src/motion/cmc/{cmc,ecc}.cpp), but the registration
    runs on-device (phase-correlation init + ECC refinement) instead
    of host cv2 — and needs no OpenCV at all.
    """

    def __init__(self, scale: float = 0.15, n_iters: int = 8):
        self.scale = scale
        self.n_iters = n_iters
        self._prev = None

    def _downscale(self, gray):
        """Returns (small, (sy, sx)) — the ACHIEVED per-axis scales.

        The 32px floor and int truncation mean the effective scale can
        differ from the nominal self.scale (small frames especially);
        apply() must rescale translations by what actually happened,
        not by the request (ADVICE r4)."""
        h, w = gray.shape
        nh = max(int(h * self.scale), 32)
        nw = max(int(w * self.scale), 32)
        import jax

        return jax.image.resize(gray, (nh, nw), "linear"), (nh / h, nw / w)

    def apply(self, img, dets=None) -> np.ndarray:
        import jax.numpy as jnp

        small, (sy, sx) = self._downscale(jnp.asarray(_to_gray(img)))
        if self._prev is None or self._prev.shape != small.shape:
            self._prev = small
            return IDENTITY.copy()
        warp, _ = _ecc_jax_core(self._prev, small, n_iters=self.n_iters)
        warp = np.array(warp)
        # rescale translation by the achieved per-axis ratios
        # (ecc.cpp:70-80 divides by the nominal scale; identical when
        # the resize hits it exactly)
        warp[0, 2] /= sx
        warp[1, 2] /= sy
        self._prev = small
        return warp

    def reset(self):
        self._prev = None


class SOFJax:
    """TPU-native sparse-flow CMC (see module doc)."""

    def __init__(self, scale: float = 0.25, n_corners: int = 256):
        self.scale = scale
        self.n_corners = n_corners
        self._prev = None
        self._shape = None

    def _downscale(self, gray):
        """Returns (small, (sy, sx)) achieved per-axis scales — see
        ECCJax._downscale for why translations rescale by these."""
        h, w = gray.shape
        nh, nw = max(int(h * self.scale), 32), max(int(w * self.scale), 32)
        import jax

        return np.asarray(
            jax.image.resize(gray, (nh, nw), "linear")
        ), (nh / h, nw / w)

    def apply(self, img, dets=None) -> np.ndarray:
        import jax.numpy as jnp

        gray = _to_gray(img)
        small, (sy, sx) = self._downscale(jnp.asarray(gray))
        if self._prev is None or self._prev.shape != small.shape:
            self._prev = small
            return IDENTITY.copy()
        warp, _ = _sof_jax_core(
            jnp.asarray(self._prev), jnp.asarray(small),
            n_corners=self.n_corners,
        )
        warp = np.array(warp)  # copy: jnp arrays are read-only
        warp[0, 2] /= sx
        warp[1, 2] /= sy
        self._prev = small
        return warp

    def reset(self):
        self._prev = None


def create_cmc(method: str = "ecc", prefer_jax: bool = False):
    """Factory mirroring the reference's cmc_method dispatch."""
    if method in ("", "none", None):
        return None
    if method == "sof_jax" or (prefer_jax and method == "sof"):
        return SOFJax()
    if method == "ecc_jax" or (prefer_jax and method == "ecc"):
        return ECCJax()
    if prefer_jax:
        return SOFJax()
    if method == "sof":
        return SOF()
    if method == "ecc":
        return ECC()
    raise ValueError(f"Unknown cmc method: {method}")
