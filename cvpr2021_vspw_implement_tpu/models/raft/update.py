"""RAFT update block: motion encoder + separable ConvGRU + flow head
(reference: RAFT_core/update.py)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..layers import Conv, kaiming_normal_fan_out


class FlowHead(nn.Module):
    hidden_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.hidden_dim, 3, padding=1, dtype=self.dtype,
                         kernel_init=kaiming_normal_fan_out, name="conv1")(x))
        return Conv(2, 3, padding=1, dtype=self.dtype,
                    kernel_init=kaiming_normal_fan_out, name="conv2")(x)


class SepConvGRU(nn.Module):
    """Two-pass (1x5 then 5x1) gated recurrent unit (update.py:33-60)."""

    hidden_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, h, x):
        for axis, (kh, kw, ph, pw) in enumerate([(1, 5, 0, 2), (5, 1, 2, 0)]):
            def conv(name, inp):
                return nn.Conv(self.hidden_dim, (kh, kw),
                               padding=((ph, ph), (pw, pw)), dtype=self.dtype,
                               param_dtype=jnp.float32,
                               kernel_init=kaiming_normal_fan_out,
                               name=name)(inp)
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(conv(f"convz{axis + 1}", hx))
            r = nn.sigmoid(conv(f"convr{axis + 1}", hx))
            q = nn.tanh(conv(f"convq{axis + 1}",
                             jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """corr+flow → 128-d motion features (update.py:80-97)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(Conv(256, 1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="convc1")(corr))
        cor = nn.relu(Conv(192, 3, padding=1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="convc2")(cor))
        flo = nn.relu(Conv(128, 7, padding=3, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="convf1")(flow))
        flo = nn.relu(Conv(64, 3, padding=1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="convf2")(flo))
        out = nn.relu(Conv(126, 3, padding=1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    hidden_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(dtype=self.dtype, name="encoder")(flow, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=self.dtype,
                         name="gru")(net, gru_in)
        delta_flow = FlowHead(256, dtype=self.dtype, name="flow_head")(net)
        m = nn.relu(Conv(256, 3, padding=1, dtype=self.dtype,
                         kernel_init=kaiming_normal_fan_out,
                         name="mask_0")(net))
        mask = 0.25 * Conv(64 * 9, 1, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="mask_2")(m)
        return net, mask, delta_flow
