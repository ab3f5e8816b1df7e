"""Benchmark: flagship TCB-PSP (ResNet-101 dilated) clip inference on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures target-frames/sec/chip for the paper's headline temporal model:
a clip of 3 context frames + target at VSPW-480p eval resolution (480x853),
bf16 compute, producing the full-resolution argmax prediction per frame —
the per-frame work of the reference's eval driver (test_clip2.py:28-89;
argmax-of-softmax == argmax-of-logits, so predictions are identical).

Timing notes: under this image's axon TPU tunnel, ``block_until_ready`` does
not actually synchronize, so every timed step forces a scalar readback.

``vs_baseline``: the reference repo publishes no numbers (see BASELINE.md);
the denominator is a documented estimate of the PyTorch reference's
throughput for this config on a V100-class GPU (~15 target-frames/sec fp32,
from the ~1.5 TFLOP/clip cost of an OS-8 R101 over 4 frames at 480p).
The north-star asks for ≥2x reference frames/sec/chip.
"""

import json
import time

REF_FRAMES_PER_SEC_ESTIMATE = 15.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cvpr2021_vspw_implement_tpu.models.builder import ModelBuilder
    from cvpr2021_vspw_implement_tpu.models.clip_psp import ClipPSP
    from cvpr2021_vspw_implement_tpu.models.segmentation import inference_pred

    enc = ModelBuilder.build_encoder("resnet101dilated", dtype=jnp.bfloat16)
    model = ClipPSP(encoder=enc, num_class=124, fc_dim=2048,
                    dtype=jnp.bfloat16)

    t1, b, h, w = 4, 1, 480, 853  # 3 context frames + target, 480p eval
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.standard_normal((t1, b, h, w, 3), dtype=np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           imgs[:, :, :64, :64], train=False)

    @jax.jit
    def infer(v, x):
        pred = inference_pred(model.apply(v, x, train=False), (h, w))
        # scalar fingerprint forces real execution through the tunnel
        return pred, jnp.sum(pred[0, ::97, ::97].astype(jnp.int32))

    _, s = infer(variables, imgs)
    float(s)  # compile + first execution

    best = 0.0
    for _trial in range(3):
        n = 8
        start = time.perf_counter()
        for i in range(n):
            _, s = infer(variables, imgs)
            float(s)
        dt = time.perf_counter() - start
        best = max(best, n * b / dt)

    print(json.dumps({
        "metric": "tcb_psp_r101_480p_clip4_inference",
        "value": round(best, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(best / REF_FRAMES_PER_SEC_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
