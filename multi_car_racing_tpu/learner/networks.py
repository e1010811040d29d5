"""Actor-critic networks (flax.linen).

Two torsos:
- ``state``: MLP over the 20-d state-vector observation (obs.py).
- ``pixels``: Nature-CNN over the 96x96x3 uint8 frames the reference defines
  as the observation (mcr:166). Convolutions run in bfloat16 — they are where
  the MXU FLOPs are — with float32 params and heads.

One shared policy for all agents (self-play): inputs are batched over
(..., num_agents) leading dims and the network is agnostic to them.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class StateTorso(nn.Module):
    width: int = 256

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.orthogonal(jnp.sqrt(2.0))
        x = nn.Dense(self.width, kernel_init=init)(x)
        x = nn.tanh(x)
        x = nn.Dense(self.width, kernel_init=init)(x)
        x = nn.tanh(x)
        return x


class PixelTorso(nn.Module):
    """Nature CNN, bf16 compute."""

    @nn.compact
    def __call__(self, x):
        # x: (..., 96, 96, 3) uint8
        x = x.astype(jnp.bfloat16) / 255.0
        x = nn.Conv(32, (8, 8), strides=(4, 4), dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (4, 4), strides=(2, 2), dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(1, 1), dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.Dense(512, dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        return x.astype(jnp.float32)


class ActorCritic(nn.Module):
    obs_type: str = "state"      # 'state' | 'pixels'
    action_dim: int = 3
    width: int = 256             # state-torso width

    @nn.compact
    def __call__(self, obs):
        torso = (StateTorso(self.width) if self.obs_type == "state"
                 else PixelTorso())
        h = torso(obs)
        mean = nn.Dense(self.action_dim,
                        kernel_init=nn.initializers.orthogonal(0.01))(h)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.action_dim,)
        )
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0))(h)
        return mean, jnp.broadcast_to(log_std, mean.shape), value[..., 0]
