"""On-device image preprocessing + training augmentation.

The reference runs torchvision transforms per frame on dataloader worker CPUs
(reference: data/data_process.py:55-69): Resize/ToTensor/Normalize for eval,
plus RandomHorizontalFlip + RandomVerticalFlip + RandomRotation(90) for
training. Here the host decoder hands fixed-shape uint8 frames to the device
and everything else — normalisation and augmentation — is jitted XLA work
(VPU elementwise + gathers), keeping the host thin.

Semantics mirrored: flips are p=0.5 Bernoulli; rotation draws a uniform angle
in [-90, 90] degrees with nearest-neighbour resampling and zero fill
(torchvision RandomRotation defaults). Per-clip augmentation uses ONE draw for
all frames of a clip, matching per-video consistency (the reference actually
re-draws per frame inside extract_frames — src/utils.py:33 applies the
transform frame-by-frame — which decorrelates frames of one clip; set
per_frame=True to reproduce that quirk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from deepfake_tpu.ops.mel import IMAGENET_MEAN, IMAGENET_STD


def normalize_imagenet(frames: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., H, W, 3] -> float32 normalised."""
    x = frames.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def normalize_imagenet_folded(frames: jnp.ndarray, channels: int = 3) -> jnp.ndarray:
    """uint8 channel-folded [..., H, W*C] -> float32 normalised. The folded
    layout keeps device lanes dense (a trailing dim of 3 is lane-padded
    3->128 in TPU tiled layouts: ~43x the bytes on every read); per-channel
    mean/std tile along the folded axis."""
    x = frames.astype(jnp.float32) / 255.0
    reps = x.shape[-1] // channels
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN), reps)
    std = jnp.tile(jnp.asarray(IMAGENET_STD), reps)
    return (x - mean) / std


def rotate_nearest(img: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate [H, W, C] about the center, nearest-neighbour, zero fill."""
    H, W = img.shape[0], img.shape[1]
    theta = -angle_deg * jnp.pi / 180.0  # inverse mapping
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    y0, x0 = yy - cy, xx - cx
    src_y = jnp.round(cy + y0 * jnp.cos(theta) - x0 * jnp.sin(theta)).astype(jnp.int32)
    src_x = jnp.round(cx + y0 * jnp.sin(theta) + x0 * jnp.cos(theta)).astype(jnp.int32)
    valid = (src_y >= 0) & (src_y < H) & (src_x >= 0) & (src_x < W)
    src_y = jnp.clip(src_y, 0, H - 1)
    src_x = jnp.clip(src_x, 0, W - 1)
    out = img[src_y, src_x]
    return jnp.where(valid[..., None], out, jnp.zeros_like(out))


def augment_clip(
    rng: jax.Array, frames: jnp.ndarray, per_frame: bool = False
) -> jnp.ndarray:
    """Train-time augmentation for one clip [T, H, W, C] (float, already
    normalised): hflip(p=.5), vflip(p=.5), rotation U(-90, 90) nearest."""
    T = frames.shape[0]
    n = T if per_frame else 1
    k_h, k_v, k_r = jax.random.split(rng, 3)
    hflip = jax.random.bernoulli(k_h, 0.5, (n,))
    vflip = jax.random.bernoulli(k_v, 0.5, (n,))
    angle = jax.random.uniform(k_r, (n,), minval=-90.0, maxval=90.0)
    if not per_frame:
        hflip = jnp.broadcast_to(hflip, (T,))
        vflip = jnp.broadcast_to(vflip, (T,))
        angle = jnp.broadcast_to(angle, (T,))

    def one(frame, h, v, a):
        frame = jnp.where(h, frame[:, ::-1], frame)
        frame = jnp.where(v, frame[::-1], frame)
        return rotate_nearest(frame, a)

    return jax.vmap(one)(frames, hflip, vflip, angle)


@functools.partial(jax.jit, static_argnames=("train", "per_frame", "fold"))
def preprocess_clip_batch(
    rng: jax.Array, frames_u8: jnp.ndarray, train: bool = False,
    per_frame: bool = False, fold: bool = False,
) -> jnp.ndarray:
    """uint8 [B, T, H, W, 3] (or channel-folded [B, T, H, W*3], eval only)
    -> normalised (+augmented when train) float32. fold=True returns the
    channel-folded [B, T, H, W*3] layout the Swin3D stack consumes without
    lane padding (the fold happens inside this jit, so XLA fuses it with the
    normalisation/augmentation writes instead of paying a padded-layout
    relayout pass)."""
    if frames_u8.ndim in (4, 6):
        # folded [B,T,H,W*3] or pre-windowed [B,nd,nh,nw,N,Ct] input:
        # eval-only (augmentation needs the spatial layout). Both layouts
        # keep channels fastest along the last axis, so the tiled-stat
        # normalisation applies unchanged.
        assert not train, "train augmentation requires the [B,T,H,W,3] layout"
        return normalize_imagenet_folded(frames_u8)
    B, T, H, W, C = frames_u8.shape
    x = normalize_imagenet(frames_u8)
    if train:
        keys = jax.random.split(rng, x.shape[0])
        x = jax.vmap(lambda k, clip: augment_clip(k, clip, per_frame))(keys, x)
    return x.reshape(B, T, H, W * C) if fold else x
