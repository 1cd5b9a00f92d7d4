"""Rematerialized (jax.checkpoint) C3 stacks: exact equivalence.

YOLOv5(remat=True) wraps every C3 in nn.remat so activations recompute in
the backward pass (HBM-for-FLOPs trade enabling l/x-width training at 640²).
Remat must be semantically invisible: identical param structure, identical
outputs, identical gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from yolov5m_tpu.models import YOLOv5


def test_remat_is_semantically_invisible():
    m0 = YOLOv5(first_out=8, nc=4)
    m1 = YOLOv5(first_out=8, nc=4, remat=True)
    v = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    v1 = m1.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert (jax.tree_util.tree_structure(v1["params"])
            == jax.tree_util.tree_structure(v["params"]))

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    for a, b in zip(m0.apply(v, x, train=False),
                    m1.apply(v, x, train=False)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def loss_of(m):
        def f(p):
            outs, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                              x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o ** 2) for o in outs)
        return f

    g0 = jax.jit(jax.grad(loss_of(m0)))(v["params"])
    g1 = jax.jit(jax.grad(loss_of(m1)))(v["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_remat_scope_all_is_semantically_invisible():
    """remat_scope="all" (every CBL/C3/SPPF wrapped — the finer stash that
    lets bs=256 buckets fit HBM) must also be a pure memory/FLOPs trade:
    same param structure, same outputs, same gradients."""
    m0 = YOLOv5(first_out=8, nc=4)
    m2 = YOLOv5(first_out=8, nc=4, remat=True, remat_scope="all")
    v = m0.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    v2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert (jax.tree_util.tree_structure(v2["params"])
            == jax.tree_util.tree_structure(v["params"]))

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    for a, b in zip(m0.apply(v, x, train=False),
                    m2.apply(v, x, train=False)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def loss_of(m):
        def f(p):
            outs, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                              x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(o ** 2) for o in outs)
        return f

    g0 = jax.jit(jax.grad(loss_of(m0)))(v["params"])
    g2 = jax.jit(jax.grad(loss_of(m2)))(v["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
