"""Streaming TCB-PSP inference: encode each frame once, reuse pooled stats.

The reference eval loop re-encodes the full (T+1)-frame window for every
eval frame (TestDataset_longclip + Clip_PSP forward).  Because the blend
only consumes per-frame pooled PPM statistics (≤6x6xC) plus the target's C5
map, a streaming evaluator encodes each video frame exactly ONCE, caches its
pooled stats (a few KB), keeps a short lookahead buffer of C5 maps, and
fuses windows as their future context becomes available.  Predictions are
bit-identical to the window formulation; encoder work drops by ~(T+1)x.

Not applicable with ``psp_weight`` (the softmax weights couple frames in
input order); the driver falls back to the window path there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models.segmentation import inference_pred, inference_pred_rt
from .ops.masked import bucket_hw, feature_valid, pad_to


class ClipPSPBucketEngine:
    """Width-bucketed compiled kernels for ClipPSP streaming eval, shared
    across ALL videos of an eval run.

    VSPW-480p val is 480 x variable-width (reference: dataset2.py:34-141);
    a per-shape jit pays one multi-minute XLA compile per distinct width
    through the axon tunnel.  This engine pads every frame to the next
    ``bucket`` multiple, passes the TRUE size as runtime scalars into the
    masked model paths (ops/masked.py), and caches ONE compiled
    encode/fuse pair per bucket — predictions on the valid region are
    bit-identical to the unpadded run (tests/test_masked_eval.py).

    ``len(engine.encode_shapes)`` == number of compiles == number of
    distinct buckets touched.
    """

    def __init__(self, model, variables, bucket: int = 64):
        assert bucket % 32 == 0, "bucket must cover the encoder stride (32)"
        self.model = model
        self.variables = variables
        self.bucket = bucket
        self._encode = {}
        self._fuse = {}

    @property
    def encode_shapes(self):
        return sorted(self._encode)

    def pad_hw(self, h: int, w: int) -> tuple[int, int]:
        return bucket_hw(h, w, self.bucket)

    def encode(self, frame):
        """frame: [H, W, 3] normalized → (C5, pooled stats) of the TRUE
        frame (C5 padded on the bucket grid, zero beyond its valid size)."""
        h, w = frame.shape[:2]
        key = self.pad_hw(h, w)
        fn = self._encode.get(key)
        if fn is None:
            model, variables = self.model, self.variables

            @jax.jit
            def fn(imgp, hv, wv):
                return model.apply(variables, imgp, train=False,
                                   valid_hw=(hv, wv),
                                   method=model.encode_frame)

            self._encode[key] = fn
        imgp = pad_to(jnp.asarray(frame)[None], key)
        return fn(imgp, jnp.int32(h), jnp.int32(w))

    def fuse(self, c5_t, blended, true_hw):
        """Fuse + argmax at the TRUE resolution ``true_hw`` (the eval
        output size == the input frame size).  Returns [H, W] uint8."""
        h, w = true_hw
        key = self.pad_hw(h, w)
        fn = self._fuse.get(key)
        if fn is None:
            model, variables = self.model, self.variables

            @jax.jit
            def fn(c5_t, blended, hv, wv):
                fh, fw = c5_t.shape[1:3]
                fv = feature_valid(fh, fw, (hv, wv), key)
                logits = model.apply(variables, c5_t, blended, train=False,
                                     feat_valid=fv,
                                     method=model.fuse_target)
                return inference_pred_rt((logits,), key, fv, (hv, wv))

            self._fuse[key] = fn
        pred = fn(c5_t, blended, jnp.int32(h), jnp.int32(w))
        return np.asarray(pred)[0, :h, :w]


class ExactShapeEngine:
    """EXACT-shape compiled encode/fuse kernels cached across videos (the
    third leg of ``--eval_policy``; works for both ClipPSP and ClipOCR —
    their streaming surface is the same (encode_frame, fuse_target) pair).

    VSPW's per-video shape is constant and the val list draws from a
    handful of distinct widths, so an exact kernel amortizes its one XLA
    compile over EVERY video of that width — and, with the persistent
    compile cache (enabled by the drivers), over every future run — while
    running without the width-bucketed masked kernels' measured per-frame
    tax (tools/eval_policy_micro.py).  Pick per shape with
    ``--eval_policy auto``: bucketed for rare shapes (one compile per
    bucket, shared), exact for shapes with enough total frames."""

    def __init__(self, model, variables):
        self.model = model
        self.variables = variables
        self._encode = {}
        self._fuse = {}

    @property
    def encode_shapes(self):
        return sorted(self._encode)

    def pad_hw(self, h: int, w: int) -> tuple[int, int]:
        return (h, w)

    def encode(self, frame):
        """frame: [H, W, 3] normalized → per-frame cached stats."""
        h, w = frame.shape[:2]
        fn = self._encode.get((h, w))
        if fn is None:
            model, variables = self.model, self.variables

            @jax.jit
            def fn(img):
                return model.apply(variables, img, train=False,
                                   method=model.encode_frame)

            self._encode[(h, w)] = fn
        return fn(jnp.asarray(frame)[None])

    def fuse(self, feat_t, blended, true_hw):
        """Fuse + argmax at the exact resolution.  Returns [H, W] uint8."""
        h, w = true_hw
        fn = self._fuse.get((h, w))
        if fn is None:
            model, variables = self.model, self.variables

            @jax.jit
            def fn(feat_t, blended):
                logits = model.apply(variables, feat_t, blended,
                                     train=False, method=model.fuse_target)
                return inference_pred((logits,), (h, w))

            self._fuse[(h, w)] = fn
        return np.asarray(fn(feat_t, blended))[0]


def video_shape_census(dataroot, videos):
    """{(h, w): total frames} + {video: (h, w)} from the frame headers
    (PIL reads the size without decoding) — the ``--eval_policy auto``
    amortization input."""
    import os

    from PIL import Image

    census, shapes = {}, {}
    for v in videos:
        d = os.path.join(dataroot, "data", v, "origin")
        frames = os.listdir(d)
        if not frames:
            continue
        with Image.open(os.path.join(d, sorted(frames)[0])) as im:
            w, h = im.size
        shapes[v] = (h, w)
        census[(h, w)] = census.get((h, w), 0) + len(frames)
    return census, shapes


class _WindowStreamer:
    """Shared lookahead loop: encode frames once, fuse windows when every
    member's cached stats are available."""

    def __init__(self, model, variables, dilation2, num_frames: int,
                 seg_size, engine=None):
        self.model = model
        self.variables = variables
        self.dilation2 = list(dilation2)
        self.n = num_frames
        self.seg_size = tuple(seg_size)
        self.engine = engine
        self._encode, self._fuse = self._build(model, variables)

    def context_indices(self, i: int) -> list[int]:
        """Window offsets with the reference's end-of-video flip
        (TestDataset_longclip, dataset2.py:460-466); negative indices wrap
        exactly like python list indexing in the reference."""
        out = []
        for dil in self.dilation2:
            j = i - dil if i + self.dilation2[-1] >= self.n else i + dil
            out.append(j % self.n)
        return out

    def run(self, frames_iter):
        """frames_iter yields [H, W, 3] normalized frames in order.
        Yields (frame_idx, pred [H, W] uint8) in order."""
        stats_cache: dict[int, object] = {}
        feat_buffer: dict[int, jax.Array] = {}
        next_to_fuse = 0

        for j, frame in enumerate(frames_iter):
            feat, stats = self._encode(jnp.asarray(frame[None]))
            feat_buffer[j] = feat
            stats_cache[j] = stats
            while next_to_fuse < self.n:
                i = next_to_fuse
                ctx = self.context_indices(i)
                if any(k > j for k in [i] + ctx):
                    break
                pred = self._fuse(feat_buffer[i],
                                  self._blend(stats_cache, [i] + ctx))
                del feat_buffer[i]
                yield i, np.asarray(pred)[0]
                next_to_fuse += 1


class ClipPSPStreamer(_WindowStreamer):
    """TCB-PSP: cached stats = per-scale pooled pyramids (≤6x6xC each).

    With ``psp_weight`` the cache also holds the per-frame scalar weight
    logit; the blend replicates the reference's off-by-one pairing —
    features ordered [target, ctx...] multiplied by softmax weights in
    INPUT order [ctx..., target] (clip_psp.py:147-187), then mean."""

    def _build(self, model, variables):
        self._psp_weight = bool(getattr(model, "psp_weight", False))

        if self.engine is not None:
            # width-bucketed masked kernels shared across videos — one
            # compile per bucket instead of per distinct width
            eng = self.engine

            def encode(img):
                return eng.encode(np.asarray(img)[0])

            def fuse(c5_t, blended):
                return eng.fuse(c5_t, blended, self.seg_size)[None]

            return encode, fuse

        @jax.jit
        def encode(img):
            return model.apply(variables, img, train=False,
                               method=model.encode_frame)

        @jax.jit
        def fuse(c5_t, blended):
            logits = model.apply(variables, c5_t, blended, train=False,
                                 method=model.fuse_target)
            return inference_pred((logits,), self.seg_size)

        return encode, fuse

    def _blend(self, cache, idxs):
        if not self._psp_weight:
            # mean over [target, ctx...] per scale — identical to the window
            # forward's jnp.mean over the time axis
            return [jnp.mean(jnp.stack([cache[k][s] for k in idxs]), 0)
                    for s in range(len(cache[idxs[0]]))]
        target, ctx = idxs[0], idxs[1:]
        # softmax over frames in input order (ctx..., target)
        wps = jnp.stack([cache[k][1] for k in list(ctx) + [target]])  # [T,B]
        w = jax.nn.softmax(wps.astype(jnp.float32), axis=0)
        feats_order = [target] + list(ctx)  # reference feature order
        out = []
        n_scales = len(cache[target][0])
        for s in range(n_scales):
            stacked = jnp.stack([cache[k][0][s] for k in feats_order])
            out.append(jnp.mean(
                stacked * w[:, :, None, None, None].astype(stacked.dtype), 0))
        return out


class NetWarpBucketEngine:
    """Width-bucketed compiled kernels for NetWarp / NetWarp-OCR streaming
    eval, shared across ALL videos of an eval run: masked trunk+decoder
    encode, and a fuse that runs the frozen RAFT at the reference's exact
    symmetric-/8-pad geometry INSIDE the bucket grid (masked instance
    norm, masked corr pyramid, masked GRU carries — models/raft/), with
    runtime-size nearest flow resizes and (dim-1)-normalized warps."""

    def __init__(self, model, variables, bucket: int = 64):
        assert bucket % 32 == 0, "bucket must cover the encoder stride (32)"
        self.model = model
        self.variables = variables
        self.bucket = bucket
        self.ocr = bool(model.ocr)
        self._encode = {}
        self._fuse = {}

    @property
    def encode_shapes(self):
        return sorted(self._encode)

    def pad_hw(self, h: int, w: int) -> tuple[int, int]:
        return bucket_hw(h, w, self.bucket)

    def encode(self, frame):
        h, w = frame.shape[:2]
        key = self.pad_hw(h, w)
        fn = self._encode.get(key)
        if fn is None:
            model, variables = self.model, self.variables

            @jax.jit
            def fn(imgp, hv, wv):
                return model.apply(variables, imgp, train=False,
                                   valid_hw=(hv, wv),
                                   method=model.encode_frame)

            self._encode[key] = fn
        imgp = pad_to(jnp.asarray(frame)[None], key)
        return fn(imgp, jnp.int32(h), jnp.int32(w))

    def fuse(self, target_frame, prev_frame, c5_t, c5_p, feats_p,
             c4_t=None):
        h, w = target_frame.shape[:2]
        key = self.pad_hw(h, w)
        fn = self._fuse.get(key)
        if fn is None:
            model, variables = self.model, self.variables
            ocr = self.ocr

            @jax.jit
            def fn(timg, pimg, c5_t, c5_p, feats_p, c4_t, hv, wv):
                kw = {}
                if ocr:
                    kw["conv_out_t_rest"] = (c4_t, c4_t, c4_t)
                pred, _ = model.apply(variables, timg, pimg, c5_t, c5_p,
                                      feats_p, train=False,
                                      valid_hw=(hv, wv),
                                      method=model.fuse_pair, **kw)
                fh, fw = pred.shape[1:3]
                fv = feature_valid(fh, fw, (hv, wv), key)
                return inference_pred_rt((pred,), key, fv, (hv, wv))

            self._fuse[key] = fn
        timg = pad_to(jnp.asarray(target_frame)[None], key)
        pimg = pad_to(jnp.asarray(prev_frame)[None], key)
        if c4_t is None:
            c4_t = jnp.zeros((1, 1, 1, 1), jnp.float32)
        pred = fn(timg, pimg, c5_t, c5_p, feats_p, c4_t,
                  jnp.int32(h), jnp.int32(w))
        return np.asarray(pred)[0, :h, :w]


class NetWarpStreamer:
    """NetWarp / NetWarp-OCR eval with per-frame feature caching
    (dilation_num == 0, clip_num == 2 — the reference's only NetWarp
    config).  Each frame's encoder + decoder features are computed ONCE
    (for OCR, c4 is cached too for the dsn head's target re-decode);
    per pair only RAFT + FlowCNN + blends + the target-side decode run —
    predictions identical to the window path, ~1.8x less compute."""

    def __init__(self, model, variables, num_frames: int, seg_size,
                 engine=None):
        self.n = num_frames
        self.seg_size = tuple(seg_size)
        self.ocr = bool(model.ocr)
        self.engine = engine

        if engine is not None:
            # width-bucketed masked kernels shared across videos
            self._encode = lambda img: engine.encode(np.asarray(img)[0])
            self._fuse = lambda timg, pimg, c5_t, c5_p, feats_p: (
                engine.fuse(np.asarray(timg)[0], np.asarray(pimg)[0],
                            c5_t, c5_p, feats_p)[None])
            self._fuse_ocr = lambda timg, pimg, c5_t, c5_p, feats_p, c4: (
                engine.fuse(np.asarray(timg)[0], np.asarray(pimg)[0],
                            c5_t, c5_p, feats_p, c4)[None])
            return

        @jax.jit
        def encode(img):
            # plain: (c5, feats); OCR: (c5, feats, c4) — the dsn head needs
            # the target's c4 at re-decode time (netwarp_ocr.py:171-186)
            return model.apply(variables, img, train=False,
                               method=model.encode_frame)

        @jax.jit
        def fuse(target_img, prev_img, c5_t, c5_p, feats_p):
            pred, _ = model.apply(variables, target_img, prev_img, c5_t,
                                  c5_p, feats_p, train=False,
                                  method=model.fuse_pair)
            return inference_pred((pred,), self.seg_size)

        @jax.jit
        def fuse_ocr(target_img, prev_img, c5_t, c5_p, feats_p, c4_t):
            pred, _ = model.apply(variables, target_img, prev_img, c5_t,
                                  c5_p, feats_p,
                                  conv_out_t_rest=(c4_t, c4_t, c4_t),
                                  train=False, method=model.fuse_pair)
            return inference_pred((pred,), self.seg_size)

        self._encode = encode
        self._fuse = fuse
        self._fuse_ocr = fuse_ocr

    def context_index(self, i: int) -> int:
        """TestDataset_clip window for clip_num=2 (dataset2.py:276-300):
        the previous frame, except the first frame uses the next one."""
        return 1 if i == 0 else i - 1

    def run(self, frames):
        """frames: list of [H, W, 3] normalized frames.
        Yields (frame_idx, pred [H, W] uint8) in order."""
        cache: dict[int, tuple] = {}

        def get(idx):
            if idx not in cache:
                cache[idx] = self._encode(jnp.asarray(frames[idx][None]))
            return cache[idx]

        for i in range(self.n):
            j = self.context_index(i)
            if self.ocr:
                c5_t, _feats_t, c4_t = get(i)
                c5_p, feats_p, _ = get(j)
                pred = self._fuse_ocr(jnp.asarray(frames[i][None]),
                                      jnp.asarray(frames[j][None]),
                                      c5_t, c5_p, feats_p, c4_t)
            else:
                c5_t, _feats_t = get(i)
                c5_p, feats_p = get(j)
                pred = self._fuse(jnp.asarray(frames[i][None]),
                                  jnp.asarray(frames[j][None]),
                                  c5_t, c5_p, feats_p)
            yield i, np.asarray(pred)[0]
            # future pairs only reference frames >= i
            for k in [k for k in cache if k < i]:
                del cache[k]


class ClipOCRBucketEngine:
    """Width-bucketed compiled kernels for ClipOCR streaming eval, shared
    across ALL videos of an eval run (the TCB-OCR analog of
    ``ClipPSPBucketEngine``): masked encode under the conv-boundary
    interceptor + padded-pixel-excluded gather (models/clip_ocr.py), fuse
    on the padded grid (the OCR attention/fuse chain past the gather is
    per-pixel, so padded-pixel garbage never reaches the valid region) +
    runtime-size prediction resize."""

    def __init__(self, model, variables, bucket: int = 64):
        assert bucket % 32 == 0, "bucket must cover the encoder stride (32)"
        self.model = model
        self.variables = variables
        self.bucket = bucket
        self._encode = {}
        self._fuse = {}

    @property
    def encode_shapes(self):
        return sorted(self._encode)

    def pad_hw(self, h: int, w: int) -> tuple[int, int]:
        return bucket_hw(h, w, self.bucket)

    def encode(self, frame):
        """frame: [H, W, 3] normalized → (OCR feats on the bucket grid —
        zero beyond the valid size — and the TRUE frame's region context)."""
        h, w = frame.shape[:2]
        key = self.pad_hw(h, w)
        fn = self._encode.get(key)
        if fn is None:
            model, variables = self.model, self.variables

            @jax.jit
            def fn(imgp, hv, wv):
                return model.apply(variables, imgp, train=False,
                                   valid_hw=(hv, wv),
                                   method=model.encode_frame)

            self._encode[key] = fn
        imgp = pad_to(jnp.asarray(frame)[None], key)
        return fn(imgp, jnp.int32(h), jnp.int32(w))

    def fuse(self, feat_t, context, true_hw):
        """OCR-attend + classify + argmax at the TRUE resolution."""
        h, w = true_hw
        key = self.pad_hw(h, w)
        fn = self._fuse.get(key)
        if fn is None:
            model, variables = self.model, self.variables

            @jax.jit
            def fn(feat_t, context, hv, wv):
                fh, fw = feat_t.shape[1:3]
                fv = feature_valid(fh, fw, (hv, wv), key)
                logits = model.apply(variables, feat_t, context,
                                     train=False,
                                     method=model.fuse_target)
                return inference_pred_rt((logits,), key, fv, (hv, wv))

            self._fuse[key] = fn
        pred = fn(feat_t, context, jnp.int32(h), jnp.int32(w))
        return np.asarray(pred)[0, :h, :w]


class ClipOCRStreamer(_WindowStreamer):
    """TCB-OCR (no memory): cached stats = [B, K, 512] region contexts."""

    def _build(self, model, variables):
        if self.engine is not None:
            # width-bucketed masked kernels shared across videos — one
            # compile per bucket instead of per distinct width
            eng = self.engine

            def encode(img):
                return eng.encode(np.asarray(img)[0])

            def fuse(feat_t, context):
                return eng.fuse(feat_t, context, self.seg_size)[None]

            return encode, fuse

        @jax.jit
        def encode(img):
            return model.apply(variables, img, train=False,
                               method=model.encode_frame)

        @jax.jit
        def fuse(feat_t, context):
            logits = model.apply(variables, feat_t, context, train=False,
                                 method=model.fuse_target)
            return inference_pred((logits,), self.seg_size)

        return encode, fuse

    @staticmethod
    def _blend(cache, idxs):
        return jnp.mean(jnp.stack([cache[k] for k in idxs]), 0)
