"""device_prefetch must yield every batch exactly once, in order."""

import numpy as np
import pytest

import jax

from cvpr2021_vspw_implement_tpu.parallel import make_mesh
from cvpr2021_vspw_implement_tpu.parallel.mesh import device_prefetch


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ devices")
def test_device_prefetch_order_and_completeness():
    mesh = make_mesh(2, 1)
    batches = [{"x": np.full((4, 3), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh, depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(b["x"][0, 0]) == i
        # sharded over the data axis
        assert len(b["x"].sharding.device_set) == 2
