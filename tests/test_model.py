"""Model topology, shape, and numeric-parity tests.

Shape assertions mirror the reference smoke test (reference model.py:258-260).
Numeric parity: a synthetic torch-layout state dict drives both the flax model
(via the weight converter) and the independent torch-functional golden
(tests/torch_golden.py); outputs must match to fp32 tolerance. This covers
model topology, NHWC/NCHW handling, padding conventions, BN math, and the
converter in one test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolov5m_tpu.models import YOLOv5
from yolov5m_tpu.models.weights import (
    convert_torch_state_dict,
    expected_torch_keys,
    export_torch_state_dict,
)


def _init_model(first_out=8, nc=4, hw=64, bs=2):
    model = YOLOv5(first_out=first_out, nc=nc, dtype=jnp.float32)
    x = jnp.zeros((bs, hw, hw, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def _random_torch_sd(variables, rng):
    sd = {}
    for key, shape in expected_torch_keys(variables).items():
        if key.endswith("running_var"):
            sd[key] = rng.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            # small std: random weights at std 0.5 blow activations up to ~1e7
            # through 20+ layers, where fp32 summation-order noise dwarfs rtol
            sd[key] = rng.normal(0, 0.05, shape).astype(np.float32)
    return sd


def test_output_shapes():
    # mirrors reference model.py:258-260 asserts (320 = same stride structure,
    # cheaper on the CPU test mesh than 640)
    model, variables = _init_model(first_out=8, nc=80, hw=320, bs=1)
    out = model.apply(variables, jnp.zeros((1, 320, 320, 3)))
    assert out[0].shape == (1, 3, 40, 40, 85)
    assert out[1].shape == (1, 3, 20, 20, 85)
    assert out[2].shape == (1, 3, 10, 10, 85)


def test_param_count_yolov5m():
    # first_out=48, nc=80 → standard YOLOv5m, ~21.2M params
    model = YOLOv5(first_out=48, nc=80, dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    n = sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"]))
    assert 20.5e6 < n < 21.5e6, f"got {n}"


def test_forward_matches_torch_golden(rng):
    torch = pytest.importorskip("torch")
    from tests.torch_golden import yolov5_forward

    nc, hw = 4, 64
    model, variables = _init_model(first_out=8, nc=nc, hw=hw)
    sd = _random_torch_sd(variables, rng)
    converted = convert_torch_state_dict(sd, variables)

    x = rng.uniform(0, 1, (2, 3, hw, hw)).astype(np.float32)
    got = model.apply(converted, jnp.asarray(x.transpose(0, 2, 3, 1)))
    exp = yolov5_forward(sd, torch.from_numpy(x), nc)

    for g, e in zip(got, exp):
        np.testing.assert_allclose(np.asarray(g), e.numpy(), rtol=1e-4, atol=1e-4)


def test_convert_roundtrip(rng):
    model, variables = _init_model()
    sd = _random_torch_sd(variables, rng)
    converted = convert_torch_state_dict(sd, variables)
    back = export_torch_state_dict(converted)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], rtol=1e-6)


def test_convert_rejects_bad_shapes(rng):
    model, variables = _init_model()
    sd = _random_torch_sd(variables, rng)
    sd["backbone.0.cbl.0.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError):
        convert_torch_state_dict(sd, variables)
    del sd["backbone.0.cbl.0.weight"]
    with pytest.raises(KeyError):
        convert_torch_state_dict(sd, variables)


def test_train_mode_updates_batch_stats():
    model, variables = _init_model()
    x = jnp.ones((2, 64, 64, 3))
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_bf16_compute_close_to_fp32(rng):
    nc, hw = 4, 64
    model32, variables = _init_model(first_out=8, nc=nc, hw=hw)
    model16 = YOLOv5(first_out=8, nc=nc, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(0, 1, (1, hw, hw, 3)).astype(np.float32))
    o32 = model32.apply(variables, x)
    o16 = model16.apply(variables, x)
    for a, b in zip(o32, o16):
        assert np.asarray(b).dtype == np.dtype("bfloat16")  # no fp32 upcast
        np.testing.assert_allclose(np.asarray(a),
                                   np.asarray(b).astype(np.float32), atol=0.15)


def test_bn_folding_matches_unfused(rng):
    """Fused (BN-folded) inference must match the standard eval forward."""
    from yolov5m_tpu.models.fuse import fold_batchnorm

    nc, hw = 4, 64
    model, variables = _init_model(first_out=8, nc=nc, hw=hw)
    # non-trivial BN stats
    sd = _random_torch_sd(variables, rng)
    variables = convert_torch_state_dict(sd, variables)

    fused_model = YOLOv5(first_out=8, nc=nc, dtype=jnp.float32, fused=True)
    fused_vars = fold_batchnorm(variables)

    x = jnp.asarray(rng.uniform(0, 1, (2, hw, hw, 3)).astype(np.float32))
    ref = model.apply(variables, x)
    got = fused_model.apply(fused_vars, x)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_s2d_stem_exact_parity(rng):
    """Space-to-depth stem rewrite equals the standard 6x6/s2 stem exactly."""
    from yolov5m_tpu.models.s2d import stem_weights_to_s2d

    nc, hw = 4, 64
    model, variables = _init_model(first_out=8, nc=nc, hw=hw)
    sd = _random_torch_sd(variables, rng)
    variables = convert_torch_state_dict(sd, variables)

    s2d_model = YOLOv5(first_out=8, nc=nc, dtype=jnp.float32, stem_s2d=True)
    s2d_vars = stem_weights_to_s2d(variables)

    x = jnp.asarray(rng.uniform(0, 1, (2, hw, hw, 3)).astype(np.float32))
    ref = model.apply(variables, x)
    got = s2d_model.apply(s2d_vars, x)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_family_variants_param_counts():
    """YOLOv5 family law (width=first_out, depth=depth_mult): parameter
    counts land on the well-known family sizes (nc=80). The reference
    hardcodes the 'm' point; n/s/l/x follow the same scaling."""
    import jax
    from yolov5m_tpu.models.yolo import from_family
    from yolov5m_tpu.utils.export import count_parameters

    expected_m = {"n": 1.9, "s": 7.2, "m": 21.2, "l": 46.5, "x": 86.7}
    for variant, millions in expected_m.items():
        model = from_family(variant, nc=80)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        n = count_parameters(v)
        assert abs(n / 1e6 - millions) < 0.6, (variant, n)
