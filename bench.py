"""Benchmark: flagship TCB-PSP (ResNet-101 dilated) streaming inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures target-frames/sec/chip of the streaming eval path (serving.py):
per video frame, ONE encoder pass + pooled-stat blend + PPM fuse + argmax at
VSPW-480p eval resolution (480x853), bf16 compute.  Predictions are
bit-identical to the reference's window formulation (test_clip2.py re-encodes
the whole 4-frame window per frame — see tests/test_streaming.py for the
equivalence proof); the streaming formulation is the TPU-native serving
design the pooled-context blending enables.

Timing notes: under this image's axon TPU tunnel ``block_until_ready`` does
not synchronize, so every timed step forces a scalar readback.

``vs_baseline``: the reference publishes no numbers (see BASELINE.md); the
denominator is a documented estimate of the PyTorch reference eval loop for
this config on a V100-class GPU (~15 target-frames/sec fp32: ~1.5 TFLOP per
4-frame window at 480p OS-8).  North star: ≥2x reference frames/sec/chip.
"""

import json
import time

REF_FRAMES_PER_SEC_ESTIMATE = 15.0


def main():
    import jax

    # persistent compile cache: the axon tunnel's remote compile of the
    # R101 graph takes minutes; later runs load the cached executable
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP
    from cvpr2021_vspw_implement_tpu.models.segmentation import inference_pred

    enc = ModelBuilder.build_encoder("resnet101dilated", dtype=jnp.bfloat16)
    model = ClipPSP(encoder=enc, num_class=124, fc_dim=2048,
                    dtype=jnp.bfloat16)

    h, w = 480, 853
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.standard_normal((1, h, w, 3), dtype=np.float32))
    # init on the host CPU backend: dispatching hundreds of tiny param-init
    # ops through the TPU tunnel costs minutes; the params transfer once
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((4, 1, 64, 64, 3), jnp.float32),
                               train=False)
    variables = jax.device_put(variables, jax.devices()[0])

    N = 16  # frames per timed call; scanned device-side so the tunnel's
            # round-trip latency is paid once per call, not per frame

    def one_frame(blended_prev, img):
        """Per-frame streaming work: encode + blend + fuse + argmax.

        blended_prev stands in for the cached context stats (their blend is
        a trivial mean of ≤6x6xC arrays, included here).  Feeding pooled
        stats forward chains the frames so they execute sequentially."""
        c5, pooled = model.apply(variables, img, train=False,
                                 method=model.encode_frame)
        blended = [jnp.mean(jnp.stack([p, q]), 0)
                   for p, q in zip(pooled, blended_prev)]
        logits = model.apply(variables, c5, blended, train=False,
                             method=model.fuse_target)
        pred = inference_pred((logits,), (h, w))
        return pooled, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))

    @jax.jit
    def run_n(img, blended0):
        carry, sums = jax.lax.scan(
            lambda c, _: one_frame(c, img), blended0, None, length=N)
        return carry, jnp.sum(sums)

    pooled0 = [jnp.zeros((1, s, s, 2048), jnp.bfloat16) for s in (1, 2, 3, 6)]
    pooled, s = run_n(frame, pooled0)
    float(s)  # compile + first execution

    best = 0.0
    for _trial in range(3):
        start = time.perf_counter()
        pooled, s = run_n(frame, pooled)
        float(s)
        dt = time.perf_counter() - start
        best = max(best, N / dt)

    print(json.dumps({
        "metric": "tcb_psp_r101_480p_streaming_inference",
        "value": round(best, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best / REF_FRAMES_PER_SEC_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
