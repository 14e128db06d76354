"""U2NetSegmenter — the rembg.remove equivalent.

Matches the reference's usage (/root/reference/utils.py:51-57,
backend/app/main.py:654-661): takes a decoded RGB array, returns an RGBA
cutout with the predicted foreground alpha. Mask postprocessing mirrors
rembg's default path: min-max normalize the saliency map, bilinear
upsample back to the source size, alpha-composite. Batched variant for
the folder-upload pipeline.

Weights: IMATCH_U2_CHECKPOINT (torch .pt/.pth state dict, converted by
convert.py) with IMATCH_U2_CONFIG selecting geometry (default u2net when
a checkpoint is set, tiny-u2 offline).
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imatch_tpu.models.u2net.configs import get_u2_config
from imatch_tpu.models.u2net.model import init_u2_params, u2net_forward
from imatch_tpu.ops.resize import resample_matrix
from imatch_tpu.utils.batching import pow2_bucket

# ImageNet normalization used by the released U²-Net / rembg pipeline.
U2_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
U2_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class U2NetSegmenter:
    available = True

    def __init__(self, config: Optional[str] = None, checkpoint: Optional[str] = None):
        checkpoint = checkpoint or os.environ.get("IMATCH_U2_CHECKPOINT")
        config = config or os.environ.get(
            "IMATCH_U2_CONFIG", "u2net" if checkpoint else "tiny-u2"
        )
        self.cfg = get_u2_config(config)
        if checkpoint:
            from imatch_tpu.models.u2net.convert import load_u2_checkpoint

            self.params = jax.tree.map(
                jnp.asarray, load_u2_checkpoint(checkpoint, self.cfg)
            )
        else:
            self.params = init_u2_params(jax.random.key(0), self.cfg)
        self.dtype = (
            jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        )
        self._lock = threading.Lock()
        self._resize_cache: Dict[tuple, tuple] = {}
        cfg, dt = self.cfg, self.dtype

        @jax.jit
        def _mask(params, pixels):
            m = u2net_forward(params, pixels, cfg, dtype=dt)
            lo = jnp.min(m, axis=(1, 2), keepdims=True)
            hi = jnp.max(m, axis=(1, 2), keepdims=True)
            return (m - lo) / jnp.maximum(hi - lo, 1e-8)

        self._mask_fn = _mask

    def _to_model_input(self, arr: np.ndarray) -> jnp.ndarray:
        return self._model_inputs_batch([arr])

    def predict_mask(self, image: np.ndarray) -> np.ndarray:
        """(H, W, 3|4) uint8 -> (H, W) float32 alpha in [0, 1]."""
        arr = np.asarray(image)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        with self._lock:
            x = self._to_model_input(arr)
            m = self._mask_fn(self.params, x)  # (1, S, S)
            m = jax.image.resize(
                m[0], (arr.shape[0], arr.shape[1]), "bilinear"
            )
            return np.asarray(jnp.clip(m, 0.0, 1.0), np.float32)

    def remove_background(self, image: np.ndarray) -> np.ndarray:
        """RGB(A) uint8 -> RGBA uint8 cutout (rembg.remove equivalent)."""
        arr = np.asarray(image)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        mask = self.predict_mask(arr)
        alpha = (mask * 255.0 + 0.5).astype(np.uint8)
        rgba = np.dstack([arr[..., :3], alpha])
        return rgba

    def _model_inputs_batch(self, arrs) -> jnp.ndarray:
        """Same-geometry RGB(A) arrays -> (B, S, S, 3) normalized batch:
        aspect-squash resize (rembg semantics — NOT the CLIP
        shortest-edge+crop: the mask must map back onto the full source
        frame), per-image max normalize (rembg divides by the image max,
        not 255 — dark images otherwise land at half the trained input
        magnitude), ImageNet mean/std. The single-image path is the
        B=1 case of this function."""
        h, w = arrs[0].shape[:2]
        size = self.cfg.input_size
        key = (h, w)
        if key not in self._resize_cache:
            if len(self._resize_cache) >= 64:  # bound device-array growth
                self._resize_cache.pop(next(iter(self._resize_cache)))
            # rembg preprocesses with PIL LANCZOS (sessions resize the
            # PIL image); bilinear here would feed the net measurably
            # different high-frequency content than the reference
            a_v = resample_matrix(h, size, "lanczos")
            a_h = resample_matrix(w, size, "lanczos")
            self._resize_cache[key] = (jnp.asarray(a_v), jnp.asarray(a_h))
        a_v, a_h = self._resize_cache[key]
        # upload the frames in their NATIVE dtype (uint8 normally) and
        # cast on device: a host-side fp32 stack quadruples the h2d
        # bytes of the largest transfer this path makes, for bit-equal
        # float values after the cast
        x = jnp.asarray(np.stack([a[..., :3] for a in arrs]))
        x = x.astype(jnp.float32)
        x = jnp.einsum("xw,bhwc->bhxc", a_h, x)
        x = jnp.einsum("yh,bhxc->byxc", a_v, x)
        m = jnp.max(x, axis=(1, 2, 3), keepdims=True)
        x = x / jnp.maximum(m, 1e-6)
        return (x - U2_MEAN) / U2_STD

    def remove_background_batch(self, images) -> list:
        """Batched rembg: ONE device mask dispatch per (H, W) geometry
        bucket (batch padded to a power of two to bound recompiles) and
        one batched upsample per bucket, instead of the per-image call
        chain the reference pays (utils.py:51-57). Alpha compositing
        stays on host. Order of results matches the input order."""
        arrs = []
        for im in images:
            a = np.asarray(im)
            if a.ndim == 2:
                a = np.stack([a] * 3, axis=-1)
            arrs.append(a)
        out: list = [None] * len(arrs)
        buckets: Dict[tuple, list] = {}
        for i, a in enumerate(arrs):
            buckets.setdefault(a.shape[:2], []).append(i)
        # chunk caps host+device memory: a geometry bucket of hundreds
        # of full-res photos stacked as one fp32 array is tens of GB
        # before the resize shrinks it (IMATCH_U2_CHUNK, default 8)
        chunk = int(os.environ.get("IMATCH_U2_CHUNK", "8"))
        from imatch_tpu.runtime.scheduler import GATE

        with self._lock:
            for (h, w), idxs in buckets.items():
                for s0 in range(0, len(idxs), chunk):
                    GATE.checkpoint()  # bulk rembg yields to searches
                    part = idxs[s0 : s0 + chunk]
                    b = len(part)
                    x = self._model_inputs_batch([arrs[i] for i in part])
                    b_pad = pow2_bucket(b, chunk)
                    if b_pad > b:
                        x = jnp.pad(
                            x, ((0, b_pad - b), (0, 0), (0, 0), (0, 0))
                        )
                    masks = self._mask_fn(self.params, x)[:b]  # (b, S, S)
                    up = jax.image.resize(masks, (b, h, w), "bilinear")
                    # alpha quantization on device: fetch uint8, not
                    # fp32 — 4x less d2h for the same bytes written
                    # into the RGBA cutout (the *255+0.5 then truncate
                    # matches the previous host-side arithmetic)
                    alpha8 = np.asarray(
                        (jnp.clip(up, 0.0, 1.0) * 255.0 + 0.5).astype(
                            jnp.uint8
                        )
                    )
                    for j, i in enumerate(part):
                        out[i] = np.dstack(
                            [arrs[i][..., :3], alpha8[j]]
                        )
        return out


def get_segmenter():
    """Factory from IMATCH_SEGMENTER.

    auto (default): a segmenter only when a real checkpoint is configured
    — random-init masks would corrupt uploads, so no checkpoint means the
    degraded mode (reference parity: rembg absent -> original image,
    backend/app/main.py:656-661). ``u2net`` forces construction (tests
    use it with the tiny config); ``null`` disables.
    """
    choice = os.environ.get("IMATCH_SEGMENTER", "auto")
    if choice == "null":
        return None
    if choice == "auto" and not os.environ.get("IMATCH_U2_CHECKPOINT"):
        return None
    return U2NetSegmenter()
