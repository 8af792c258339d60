"""Mixture-of-Experts feed-forward with expert parallelism (ep).

A beyond-reference scaling feature (the reference's only parallelism is
DDP, `/root/reference/train.py:125`, and its FF is a dense MLP,
`models/latte.py:63-78`): the DiT block's MLP is replaced by E expert
MLPs with a learned top-k router, so parameter count scales E-fold at
~constant per-token FLOPs, and the expert weights shard over a dedicated
``ep`` mesh axis.

TPU-native shape of the idea (GShard/Switch dispatch, all static shapes):

- Routing is expressed as ONE-HOT EINSUMS, not gathers: a dispatch tensor
  ``(S, E, C)`` built from ``argmax``/``cumsum`` one-hots scatters tokens
  into per-expert capacity buffers with two matmuls — MXU work instead of
  dynamic shapes, so the whole layer jits into the scanned block stack.
- Expert weights are STACKED on a leading E axis (``(E, D, H)``), so
  expert parallelism is just ``PartitionSpec("ep", ...)`` on that axis;
  with tokens dp-sharded and experts ep-sharded, GSPMD inserts the
  all-to-all pair around the expert compute automatically.
- Dispatch is GROUPED (GShard): tokens are chunked into groups of
  ``group_size`` and capacity is allocated PER GROUP,
  ``C = ceil(g·k/E · capacity_factor)``, so the dispatch tensors are
  ``(G, g, E, C)`` — O(S · g·k·cf) memory, linear in the token count —
  instead of a global ``(S, E, S·k·cf/E)`` which is quadratic and OOMs
  at video token counts. Overflow tokens within a group are dropped
  (their FF contribution is zero and the residual passes them through) —
  the standard Switch/GShard semantics, and the price of static shapes.

The router computes in fp32 regardless of model dtype (softmax over
logits is precision-sensitive); the Switch load-balancing auxiliary loss
``E · Σ_e f_e · P_e`` is sown under ``intermediates/moe_aux_loss`` and
picked up by the train step when ``moe_aux_weight > 0``.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

__all__ = ["MoEMlp"]


class MoEMlp(nn.Module):
    """Drop-in MoE replacement for :class:`latte_tpu.models.layers.Mlp`.

    Args mirror ``Mlp`` plus:
      num_experts: E. ``E == 1`` degenerates to a dense MLP (the router
        softmax over one expert is identically 1), which the tests use to
        pin equivalence with ``Mlp``.
      top_k: experts per token (1 = Switch, 2 = GShard default). Gates are
        renormalized over the selected experts when ``top_k > 1``.
      capacity_factor: slack over the perfectly-balanced ``g·k/E`` tokens
        per expert per group.
      group_size: tokens per dispatch group (GShard grouping). The
        effective group is the largest divisor of S not exceeding this;
        tiny inputs (S <= group_size) route as one global group. Larger
        groups = looser local-balance requirement but more dispatch
        memory (O(S · g · k · capacity_factor)).
      activation_fn: expert nonlinearity — ``"gelu-approximate"`` (tanh
        gelu, the Latte ``Mlp``/diffusers default) or ``"geglu"`` (the
        LatteT2V FF: ``wi`` projects to 2H, half gates the other through
        exact gelu — `models/t2v.py` T2VFeedForward).
      ep_axis: mesh axis name to constrain the expert-major intermediates
        to (``P(ep_axis, None, None)``). ``None`` leaves placement to SPMD
        propagation from the weight shardings — required when jitting
        without a mesh context.
    """

    hidden_features: int
    out_features: int
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    ep_axis: Optional[str] = None
    activation_fn: str = "gelu-approximate"
    group_size: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, D = x.shape
        S = B * N
        E = self.num_experts
        k = min(self.top_k, E)
        # GShard grouping: largest divisor of S within group_size (all
        # static — S is a trace-time constant; B·N is 2^a·small in
        # practice so this terminates immediately)
        g = min(self.group_size, S)
        while S % g:
            g -= 1
        G = S // g
        C = max(1, int(math.ceil(g * k * self.capacity_factor / E)))
        C = min(C, g)  # an expert can never receive more than every token

        xf = x.reshape(S, D)

        # --- router (fp32) -------------------------------------------------
        router = self.param(
            "router",
            nn.initializers.normal(stddev=0.02),
            (D, E),
            jnp.float32,
        )
        logits = xf.astype(jnp.float32) @ router
        probs = jax.nn.softmax(logits, axis=-1)  # (S, E)

        # top-k by iterative masking (k is 1 or 2 in practice; a python
        # loop of one-hots beats a sort on the VPU and keeps shapes static)
        masks, gates = [], []
        p = probs
        for _ in range(k):
            idx = jnp.argmax(p, axis=-1)
            m = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # (S, E)
            gates.append(jnp.sum(probs * m, axis=-1))  # raw prob of choice
            masks.append(m)
            p = p * (1.0 - m)

        # Switch load-balancing loss on the FIRST choice: E · Σ_e f_e P_e,
        # minimized (=1) at a uniform token->expert split
        f_e = jnp.mean(masks[0], axis=0)
        P_e = jnp.mean(probs, axis=0)
        self.sow("intermediates", "moe_aux_loss", E * jnp.sum(f_e * P_e))

        if k > 1:
            denom = sum(gates) + 1e-9
            gates = [g / denom for g in gates]

        # --- capacity assignment (per group) -------------------------------
        # position of each token within its expert's per-group buffer;
        # later choices queue behind all earlier choices' tokens
        counts = jnp.zeros((G, 1, E), jnp.float32)
        dispatch = jnp.zeros((G, g, E, C), self.dtype)
        combine = jnp.zeros((G, g, E, C), self.dtype)
        for j in range(k):
            m = masks[j].reshape(G, g, E)
            pos = jnp.cumsum(m, axis=1) - m + counts  # (G, g, E)
            counts = counts + jnp.sum(m, axis=1, keepdims=True)
            keep = m * (pos < C)  # drop overflow
            pos_i = jnp.sum(pos * keep, axis=-1).astype(jnp.int32)  # (G, g)
            slot = jax.nn.one_hot(pos_i, C, dtype=jnp.float32)  # (G, g, C)
            d_j = keep[..., None] * slot[..., None, :]  # (G, g, E, C)
            dispatch = dispatch + d_j.astype(self.dtype)
            gate_j = gates[j].reshape(G, g)
            combine = combine + (gate_j[..., None, None] * d_j).astype(self.dtype)

        # --- expert compute (MXU) ------------------------------------------
        H = self.hidden_features
        geglu = self.activation_fn == "geglu"
        if not geglu and self.activation_fn != "gelu-approximate":
            raise NotImplementedError(self.activation_fn)
        Hin = 2 * H if geglu else H  # geglu: value half + gate half
        xavier = nn.initializers.xavier_uniform
        wi = self.param(
            "wi", xavier(in_axis=-2, out_axis=-1, batch_axis=(0,)), (E, D, Hin), jnp.float32
        )
        bi = self.param("bi", nn.initializers.zeros, (E, Hin), jnp.float32)
        wo = self.param(
            "wo",
            xavier(in_axis=-2, out_axis=-1, batch_axis=(0,)),
            (E, H, self.out_features),
            jnp.float32,
        )
        bo = self.param("bo", nn.initializers.zeros, (E, self.out_features), jnp.float32)

        def constrain(a):
            # expert-major intermediates (G, E, C, ·): pin E to the ep axis
            if self.ep_axis is None:
                return a
            return jax.lax.with_sharding_constraint(
                a, P(None, self.ep_axis, None, None)
            )

        xg = xf.reshape(G, g, D).astype(self.dtype)
        xin = constrain(jnp.einsum("gsec,gsd->gecd", dispatch, xg))
        h = jnp.einsum("gecd,edh->gech", xin, wi.astype(self.dtype))
        h = h + bi[None, :, None, :].astype(self.dtype)
        if geglu:
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=False)
        else:
            h = nn.gelu(h, approximate=True)
        out = jnp.einsum("gech,eho->geco", h, wo.astype(self.dtype))
        out = constrain(out + bo[None, :, None, :].astype(self.dtype))

        y = jnp.einsum("gsec,geco->gso", combine, out)
        return y.reshape(B, N, self.out_features)
