"""ADA augmentation pipeline, on-device and batched.

Parity target: training/augment.py:120-434 (AugmentPipe) + the ADA
controller in training_loop.py:165-171, 334-338. The reference
constructs this pipe but never applies it in the loss (dead hook,
SURVEY.md §2.10); here it is a functional transform actually wired into
the discriminator's background input for image-bearing configs.

TPU-native design:
- each sample draws its augmentation parameters from a folded-in PRNG
  key (no host randomness in the step);
- all geometric ops (xflip, 90° rotations, integer/fractional
  translation, isotropic/anisotropic scale, rotation) compose into ONE
  3x3 homogeneous matrix per sample, applied with a single bilinear
  resample — the reference builds the same composite matrix
  (augment.py:46-110) then resamples through upfirdn+grid_sample;
- color ops (brightness, contrast, lumaflip, hue, saturation) compose
  into one 4x4 color matrix applied per pixel;
- additive RGB noise and cutout mirror augment.py's last two groups.
- the wavelet-band imgfilter group (sym2 filter bank, per-sample
  separable FIR; augment.py:24-41, 370-404) amplifies random frequency
  bands.

Every op fires with probability ``p * strength`` per sample, matching
the reference's gating semantics.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    # Group strengths; 1 = enabled at probability p (augment.py:120-158 defaults).
    xflip: float = 1.0
    rotate90: float = 1.0
    xint: float = 1.0
    xint_max: float = 0.125
    scale: float = 1.0
    rotate: float = 1.0
    aniso: float = 1.0
    xfrac: float = 1.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 1.0
    contrast: float = 1.0
    lumaflip: float = 1.0
    hue: float = 1.0
    saturation: float = 1.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    imgfilter: float = 1.0
    imgfilter_bands: tuple = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 1.0
    cutout: float = 1.0
    noise_std: float = 0.1
    cutout_size: float = 0.5


# Conditional-critic-safe group set: geometric warps (xflip/rot90/
# translate/scale/rotate/aniso) move background content while the bbox
# inputs to the SAME conditional D stay fixed, weakening exactly the
# (bbox <-> background) alignment signal the critic must judge. Color,
# band-filtering, noise and cutout perturb appearance without moving
# content, so they are the default applied set; the full geometric pipe
# stays available behind an explicit flag (train.py --aug-geom). The
# reference never applied its pipe at all (dead hook, SURVEY.md §2.10),
# so there is no parity anchor either way.
CONDITIONAL_SAFE = AugmentConfig(
    xflip=0.0, rotate90=0.0, xint=0.0, scale=0.0, rotate=0.0, aniso=0.0,
    xfrac=0.0)


def _build_fbank(num_bands: int = 4):
    """4-band wavelet filter bank for image-space filtering.

    Same construction as the reference (augment.py:172-182): sym2
    low/high autocorrelations cascaded with zero-upsampling, yielding
    per-octave bandpass filters whose gains sum to an allpass.
    """
    import numpy as onp
    import scipy.signal

    sym2 = onp.asarray([-0.12940952255092145, 0.22414386804185735,
                        0.836516303737469, 0.48296291314469025])
    hz_lo = sym2
    hz_hi = hz_lo * ((-1) ** onp.arange(hz_lo.size))
    hz_lo2 = onp.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = onp.convolve(hz_hi, hz_hi[::-1]) / 2
    fbank = onp.eye(num_bands, 1)
    for i in range(1, num_bands):
        fbank = onp.dstack([fbank, onp.zeros_like(fbank)]).reshape(num_bands, -1)[:, :-1]
        fbank = scipy.signal.convolve(fbank, [hz_lo2])
        lo = (fbank.shape[1] - hz_hi2.size) // 2
        fbank[i, lo:lo + hz_hi2.size] += hz_hi2
    return fbank.astype(onp.float32)


_FBANK = _build_fbank()


def _apply_imgfilter(images, hz_prime):
    """Per-sample separable FIR filtering with reflect padding
    (augment.py:396-404). images [B,H,W,C]; hz_prime [B,T]."""
    t = hz_prime.shape[-1]
    p = t // 2
    c = images.shape[-1]

    def one(img, k):
        x = jnp.pad(img, ((p, p), (p, p), (0, 0)), mode="reflect")[None]
        kx = jnp.broadcast_to(k[None, :, None, None], (1, t, 1, c))
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
        ky = jnp.broadcast_to(k[:, None, None, None], (t, 1, 1, c))
        x = jax.lax.conv_general_dilated(
            x, ky, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c, precision=jax.lax.Precision.HIGHEST)
        return x[0]

    return jax.vmap(one)(images, hz_prime)


def _rot2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(theta), jnp.ones_like(theta)
    return jnp.stack([jnp.stack([c, -s, z], -1),
                      jnp.stack([s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _scale2d(sx, sy):
    z, o = jnp.zeros_like(sx), jnp.ones_like(sx)
    return jnp.stack([jnp.stack([sx, z, z], -1),
                      jnp.stack([z, sy, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _translate2d(tx, ty):
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.stack([jnp.stack([o, z, tx], -1),
                      jnp.stack([z, o, ty], -1),
                      jnp.stack([z, z, o], -1)], -2)


def bilinear_sample(img, gx, gy):
    """img [H,W,C]; gx/gy [H,W] in pixel coords -> [H,W,C] (zero padded)."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = (gx - x0)[..., None]
    fy = (gy - y0)[..., None]

    def tap(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        v = img[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _apply_affine(images, mats):
    """images [B,H,W,C]; mats [B,3,3] mapping output NDC -> input NDC."""
    b, h, w, _ = images.shape
    ys, xs = jnp.meshgrid(jnp.linspace(-1, 1, h), jnp.linspace(-1, 1, w), indexing="ij")
    grid = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=-1)  # [H,W,3]

    def one(img, m):
        src = jnp.einsum("ij,hwj->hwi", m, grid)
        gx = (src[..., 0] + 1) * 0.5 * (w - 1)
        gy = (src[..., 1] + 1) * 0.5 * (h - 1)
        return bilinear_sample(img, gx, gy)

    return jax.vmap(one)(images, mats)


def augment_pipe(images, p, rng, cfg: AugmentConfig = AugmentConfig()):
    """Apply the ADA pipeline to [B,H,W,C] images at probability ``p``.

    ``p`` may be a traced scalar (the ADA-controlled value).
    """
    b = images.shape[0]
    keys = jax.random.split(rng, 17)
    p = jnp.asarray(p, jnp.float32)

    def fires(key, strength):
        return jax.random.uniform(key, (b,)) < p * strength

    eye = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
    m = eye

    # --- Blit group (augment.py:170-204) ---
    if cfg.xflip > 0:
        flip = fires(keys[0], cfg.xflip)
        m = jnp.where(flip[:, None, None], _scale2d(-jnp.ones(b), jnp.ones(b)) @ m, m)
    if cfg.rotate90 > 0:
        k = jax.random.randint(keys[1], (b,), 0, 4)
        theta = -jnp.pi / 2 * k.astype(jnp.float32)
        rot = _rot2d(theta)
        m = jnp.where(fires(keys[2], cfg.rotate90)[:, None, None], rot @ m, m)
    if cfg.xint > 0:
        t = jax.random.uniform(keys[3], (b, 2), minval=-cfg.xint_max, maxval=cfg.xint_max)
        tr = _translate2d(2 * t[:, 0], 2 * t[:, 1])
        m = jnp.where(fires(keys[4], cfg.xint)[:, None, None], tr @ m, m)

    # --- Geometric group (augment.py:207-260) ---
    if cfg.scale > 0:
        s = jnp.exp2(jax.random.normal(keys[5], (b,)) * cfg.scale_std)
        m = jnp.where(fires(keys[6], cfg.scale)[:, None, None], _scale2d(s, s) @ m, m)
    if cfg.rotate > 0:
        theta = jax.random.uniform(keys[7], (b,), minval=-jnp.pi, maxval=jnp.pi) * cfg.rotate_max
        m = jnp.where(fires(keys[8], cfg.rotate)[:, None, None], _rot2d(-theta) @ m, m)
    if cfg.aniso > 0:
        s = jnp.exp2(jax.random.normal(keys[9], (b,)) * cfg.aniso_std)
        m = jnp.where(fires(keys[10], cfg.aniso)[:, None, None], _scale2d(s, 1 / s) @ m, m)
    if cfg.xfrac > 0:
        t = jax.random.normal(keys[11], (b, 2)) * cfg.xfrac_std
        m = jnp.where(fires(keys[12], cfg.xfrac)[:, None, None],
                      _translate2d(2 * t[:, 0], 2 * t[:, 1]) @ m, m)

    identity = jnp.all(jnp.isclose(m, eye))
    images = jax.lax.cond(identity, lambda im: im, lambda im: _apply_affine(im, m), images)

    # --- Color group (augment.py:263-330): 4x4 color matrices ---
    c = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
    kc = jax.random.split(keys[13], 8)
    v_luma = jnp.asarray([1, 1, 1, 0], jnp.float32) / jnp.sqrt(3.0)
    if cfg.brightness > 0:
        bb = jax.random.normal(kc[0], (b,)) * cfg.brightness_std
        t = jnp.broadcast_to(jnp.eye(4), (b, 4, 4)).at[:, :3, 3].set(bb[:, None])
        c = jnp.where(fires(kc[1], cfg.brightness)[:, None, None], t @ c, c)
    if cfg.contrast > 0:
        cc = jnp.exp2(jax.random.normal(kc[2], (b,)) * cfg.contrast_std)
        t = jnp.broadcast_to(jnp.eye(4), (b, 4, 4)) * cc[:, None, None]
        t = t.at[:, 3, 3].set(1.0)
        c = jnp.where(fires(kc[3], cfg.contrast)[:, None, None], t @ c, c)
    if cfg.lumaflip > 0:
        t = jnp.eye(4) - 2 * jnp.outer(v_luma, v_luma)
        c = jnp.where(fires(kc[4], cfg.lumaflip)[:, None, None], t[None] @ c, c)
    if cfg.hue > 0:
        theta = jax.random.uniform(kc[5], (b,), minval=-jnp.pi, maxval=jnp.pi) * cfg.hue_max
        # Rodrigues rotation about the luma axis.
        axis = v_luma[:3]
        kmat = jnp.asarray([[0, -axis[2], axis[1]],
                            [axis[2], 0, -axis[0]],
                            [-axis[1], axis[0], 0]], jnp.float32)
        rot3 = (jnp.eye(3)[None] + jnp.sin(theta)[:, None, None] * kmat[None]
                + (1 - jnp.cos(theta))[:, None, None] * (kmat @ kmat)[None])
        t = jnp.broadcast_to(jnp.eye(4), (b, 4, 4)).at[:, :3, :3].set(rot3)
        c = jnp.where(fires(kc[6], cfg.hue)[:, None, None], t @ c, c)
    if cfg.saturation > 0:
        s = jnp.exp2(jax.random.normal(kc[7], (b,)) * cfg.saturation_std)
        outer = jnp.outer(v_luma, v_luma)
        t = outer[None] + (jnp.eye(4)[None] - outer[None]) * s[:, None, None]
        c = jnp.where(fires(keys[14], cfg.saturation)[:, None, None], t @ c, c)

    rgb1 = jnp.concatenate([images, jnp.ones_like(images[..., :1])], axis=-1)
    images = jnp.einsum("bij,bhwj->bhwi", c, rgb1,
                        precision=jax.lax.Precision.HIGHEST)[..., :3]

    # --- Image-space filtering (augment.py:374-404) ---
    if cfg.imgfilter > 0:
        num_bands = _FBANK.shape[0]
        expected_power = jnp.asarray([10.0, 1.0, 1.0, 1.0]) / 13.0
        kf = jax.random.split(keys[16], 2 * num_bands + 2)
        gvec = jnp.ones((b, num_bands))
        for i, band_strength in enumerate(cfg.imgfilter_bands):
            t_i = jnp.exp2(jax.random.normal(kf[2 * i], (b,)) * cfg.imgfilter_std)
            gate = jax.random.uniform(kf[2 * i + 1], (b,)) < p * cfg.imgfilter * band_strength
            t_i = jnp.where(gate, t_i, 1.0)
            tvec = jnp.ones((b, num_bands)).at[:, i].set(t_i)
            tvec = tvec / jnp.sqrt(
                (expected_power * jnp.square(tvec)).sum(-1, keepdims=True))
            gvec = gvec * tvec
        hz_prime = gvec @ jnp.asarray(_FBANK)  # [B, taps]
        images = _apply_imgfilter(images, hz_prime)

    # --- Noise + cutout (augment.py:399-434) ---
    kn = jax.random.split(keys[15], 4)
    if cfg.noise > 0:
        sigma = jnp.abs(jax.random.normal(kn[0], (b,))) * cfg.noise_std
        gate = fires(kn[1], cfg.noise).astype(jnp.float32)
        images = images + jax.random.normal(kn[1], images.shape) * (sigma * gate)[:, None, None, None]
    if cfg.cutout > 0:
        h, w = images.shape[1], images.shape[2]
        center = jax.random.uniform(kn[2], (b, 2))
        gate = fires(kn[3], cfg.cutout)
        ys = jnp.arange(h) / h
        xs = jnp.arange(w) / w
        in_y = jnp.abs(ys[None, :] - center[:, 1:2]) < cfg.cutout_size / 2
        in_x = jnp.abs(xs[None, :] - center[:, 0:1]) < cfg.cutout_size / 2
        hole = in_y[:, :, None] & in_x[:, None, :] & gate[:, None, None]
        images = jnp.where(hole[..., None], 0.0, images)

    return images


class AdaController:
    """Host-side ADA probability controller (training_loop.py:334-338).

    Adjusts p by sign(E[sign(D_real)] - target) every ``interval``
    batches at speed batch*interval/(ada_kimg*1000).
    """

    def __init__(self, target: float = 0.6, interval: int = 4, kimg: float = 500.0,
                 initial_p: float = 0.0):
        self.target = target
        self.interval = interval
        self.kimg = kimg
        self.p = initial_p

    def update(self, batch_idx: int, batch_size: int, signs_real_mean: float) -> float:
        if self.interval and batch_idx % self.interval == 0:
            import numpy as np

            adjust = np.sign(signs_real_mean - self.target) * (
                batch_size * self.interval) / (self.kimg * 1000)
            self.p = float(max(self.p + adjust, 0.0))
        return self.p
