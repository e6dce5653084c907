"""Dense-tower optimizers as optax transforms.

TPU-native rebuild of ref optimizers/ (AdamomOptimizer adamom.py + fused
kernel cc/kernels/training_ops.cc:78-121, rmsprop variants, Shampoo
shampoo.py). Update rules follow the reference kernels exactly; the "fused
apply" is XLA fusion.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class AdamomState(NamedTuple):
    m: chex.ArrayTree
    v: chex.ArrayTree
    c: chex.ArrayTree


def adamom(learning_rate: float = 5e-6, ada_decay: float = 0.9999,
           mom_decay: float = 0.99, epsilon: float = 1e-6,
           weight_decay: float = 0.0) -> optax.GradientTransformation:
    """ref training_ops.cc:78 ApplyAdamom:
      g' = wd*var + g; m = mom*m + (1-mom)*g'; v = ada*v + g'^2; c = ada*c + 1
      var -= lr * m * rsqrt(v/c + eps)
    """

    def init(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdamomState(m=z(), v=z(), c=z())

    def update(grads, state, params):
        g = jax.tree.map(lambda gg, p: gg + weight_decay * p, grads, params)
        m = jax.tree.map(lambda mm, gg: mom_decay * mm + (1 - mom_decay) * gg,
                         state.m, g)
        v = jax.tree.map(lambda vv, gg: ada_decay * vv + gg * gg, state.v, g)
        c = jax.tree.map(lambda cc: ada_decay * cc + 1.0, state.c)
        updates = jax.tree.map(
            lambda mm, vv, cc: -learning_rate * mm * jax.lax.rsqrt(vv / cc + epsilon),
            m, v, c)
        return updates, AdamomState(m=m, v=v, c=c)

    return optax.GradientTransformation(init, update)


def adamom_v2(learning_rate: float = 5e-6, ada_decay: float = 0.9999,
              mom_decay: float = 0.99, epsilon: float = 1e-6,
              weight_decay: float = 0.0) -> optax.GradientTransformation:
    """ref training_ops.cc:101 ApplyAdamomV2: denominator sqrt(v/c) + eps."""

    def init(params):
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdamomState(m=z(), v=z(), c=z())

    def update(grads, state, params):
        g = jax.tree.map(lambda gg, p: gg + weight_decay * p, grads, params)
        m = jax.tree.map(lambda mm, gg: mom_decay * mm + (1 - mom_decay) * gg,
                         state.m, g)
        v = jax.tree.map(lambda vv, gg: ada_decay * vv + gg * gg, state.v, g)
        c = jax.tree.map(lambda cc: ada_decay * cc + 1.0, state.c)
        updates = jax.tree.map(
            lambda mm, vv, cc: -learning_rate * mm / (jnp.sqrt(vv / cc) + epsilon),
            m, v, c)
        return updates, AdamomState(m=m, v=v, c=c)

    return optax.GradientTransformation(init, update)


def rmsprop_v2(learning_rate: float = 0.01, momentum: float = 0.9,
               weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Dense counterpart of the per-ID RMSpropV2 (rmsprop_optimizer.cc:127):
    n = mom*n + dx^2; var -= lr*dx/(sqrt(n)+1)."""

    def init(params):
        return jax.tree.map(jnp.zeros_like, params)

    def update(grads, state, params):
        dx = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
        n = jax.tree.map(lambda nn, d: momentum * nn + d * d, state, dx)
        updates = jax.tree.map(
            lambda d, nn: -learning_rate * d / (jnp.sqrt(nn) + 1.0), dx, n)
        return updates, n

    return optax.GradientTransformation(init, update)


def shampoo(learning_rate: float = 0.01, block_size: int = 128,
            beta2: float = 1.0, epsilon: float = 1e-6,
            update_preconditioner_every: int = 10,
            graft_to: str = "adagrad") -> optax.GradientTransformation:
    """Shampoo second-order preconditioning (ref optimizers/shampoo.py, the
    distributed Shampoo paper). This implementation preconditions 2D params
    (matrices) with L^{-1/4} G R^{-1/4} computed via eigendecomposition every
    `update_preconditioner_every` steps, grafting the step size to adagrad;
    other params fall back to adagrad. Designed for the small dense towers of
    recommender models (matrices <= ~1k on a side), where exact eigh on TPU
    is cheap relative to the embedding step."""

    def _pinv_root(mat, eps):
        # mat^{-1/4} via symmetric eigendecomposition
        w, u = jnp.linalg.eigh(mat + eps * jnp.eye(mat.shape[0], dtype=mat.dtype))
        w = jnp.maximum(w, eps)
        return (u * (w ** -0.25)) @ u.T

    class ShampooState(NamedTuple):
        count: chex.ArrayTree
        l_stat: chex.ArrayTree
        r_stat: chex.ArrayTree
        l_root: chex.ArrayTree
        r_root: chex.ArrayTree
        diag: chex.ArrayTree  # adagrad accumulator for grafting/fallback

    def _is_mat(p):
        return p.ndim == 2 and p.shape[0] <= 2048 and p.shape[1] <= 2048

    def init(params):
        def stat_l(p):
            return jnp.eye(p.shape[0]) * 0.0 if _is_mat(p) else jnp.zeros(())

        def stat_r(p):
            return jnp.eye(p.shape[1]) * 0.0 if _is_mat(p) else jnp.zeros(())

        def root_l(p):
            return jnp.eye(p.shape[0]) if _is_mat(p) else jnp.zeros(())

        def root_r(p):
            return jnp.eye(p.shape[1]) if _is_mat(p) else jnp.zeros(())

        return ShampooState(count=jnp.zeros((), jnp.int32),
                            l_stat=jax.tree.map(stat_l, params),
                            r_stat=jax.tree.map(stat_r, params),
                            l_root=jax.tree.map(root_l, params),
                            r_root=jax.tree.map(root_r, params),
                            diag=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1

        def upd_stat_l(s, g):
            if g.ndim != 2 or s.ndim != 2:
                return s
            gg = g @ g.T
            return beta2 * s + gg if beta2 < 1.0 else s + gg

        def upd_stat_r(s, g):
            if g.ndim != 2 or s.ndim != 2:
                return s
            gg = g.T @ g
            return beta2 * s + gg if beta2 < 1.0 else s + gg

        l_stat = jax.tree.map(upd_stat_l, state.l_stat, grads)
        r_stat = jax.tree.map(upd_stat_r, state.r_stat, grads)
        diag = jax.tree.map(lambda d, g: d + g * g, state.diag, grads)

        recompute = (count % update_preconditioner_every) == 1

        def maybe_root(root, stat):
            if stat.ndim != 2:
                return root
            return jax.lax.cond(recompute,
                                lambda: _pinv_root(stat, epsilon),
                                lambda: root)

        l_root = jax.tree.map(maybe_root, state.l_root, l_stat)
        r_root = jax.tree.map(maybe_root, state.r_root, r_stat)

        def step(g, lr_, rr_, d):
            graft = -learning_rate * g / (jnp.sqrt(d) + epsilon)
            if g.ndim != 2 or lr_.ndim != 2:
                return graft
            precond = lr_ @ g @ rr_
            # graft: preconditioned direction, adagrad step magnitude
            pn = jnp.linalg.norm(precond) + 1e-30
            gn = jnp.linalg.norm(graft)
            return -(precond / pn) * gn

        updates = jax.tree.map(step, grads, l_root, r_root, diag)
        return updates, ShampooState(count=count, l_stat=l_stat, r_stat=r_stat,
                                     l_root=l_root, r_root=r_root, diag=diag)

    return optax.GradientTransformation(init, update)
