"""BatchNorm parity with torch + cross-replica (GSPMD) equivalence.

The reference validates its sync-BN with "distributed result == single-device
result" on 2 GPUs (reference: lib/nn/modules/tests/test_sync_batchnorm.py:79-107).
The TPU-native equivalent: batch statistics computed under ``jit`` over a
batch sharded across 8 virtual devices must equal the unsharded computation —
XLA's GSPMD inserts the cross-device all-reduce automatically.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cvpr2021_vspw_implement_tpu.models.layers import BatchNorm2d


def _init(key, x):
    model = BatchNorm2d(features=x.shape[-1])
    variables = model.init(key, x, train=True)
    return model, variables


def test_bn_train_forward_and_running_stats_match_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 5, 6, 3), dtype=np.float32) * 2 + 1.5

    model, variables = _init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, mutated = model.apply(variables, jnp.asarray(x), train=True,
                             mutable=["batch_stats"])

    bn = torch.nn.BatchNorm2d(3, momentum=0.1)
    bn.train()
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    yt = bn(xt).detach().numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    # torch updates running_var with the UNBIASED batch variance
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               bn.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_bn_eval_uses_running_stats():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 4, 3), dtype=np.float32)
    model, variables = _init(jax.random.PRNGKey(0), jnp.asarray(x))
    stats = {"mean": jnp.asarray([0.5, -1.0, 2.0]),
             "var": jnp.asarray([1.5, 0.7, 2.2])}
    variables = {"params": variables["params"], "batch_stats": stats}
    y = model.apply(variables, jnp.asarray(x), train=False)

    bn = torch.nn.BatchNorm2d(3)
    bn.eval()
    bn.running_mean = torch.tensor([0.5, -1.0, 2.0])
    bn.running_var = torch.tensor([1.5, 0.7, 2.2])
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    yt = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_bn_sharded_batch_equals_single_device():
    """GSPMD sync-BN: stats over a data-sharded batch == unsharded stats."""
    rng = np.random.default_rng(2)
    # per-shard batches are intentionally non-iid so wrong (local-only)
    # statistics would show up as a large mismatch
    shards = [rng.standard_normal((2, 4, 4, 3), dtype=np.float32) * (i + 1) + i
              for i in range(8)]
    x = np.concatenate(shards, axis=0)  # [16, 4, 4, 3]

    model = BatchNorm2d(features=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)

    y_ref, stats_ref = model.apply(variables, jnp.asarray(x), train=True,
                                   mutable=["batch_stats"])

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    x_sharded = jax.device_put(jnp.asarray(x), sharding)

    @jax.jit
    def fwd(v, xx):
        return model.apply(v, xx, train=True, mutable=["batch_stats"])

    y_sh, stats_sh = fwd(variables, x_sharded)
    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats_sh["batch_stats"]["mean"]),
        np.asarray(stats_ref["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(stats_sh["batch_stats"]["var"]),
        np.asarray(stats_ref["batch_stats"]["var"]), rtol=1e-4, atol=1e-5)
