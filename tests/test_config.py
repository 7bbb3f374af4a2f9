"""Preset values must match the reference entry-point constants."""

from lrs_pnp_dip_tpu.utils.config import (
    PRESETS,
    dip_1lip_preset,
    dip_fast_preset,
    dip_preset,
    dip_tuned_preset,
    lrs_pnp_preset,
)


def test_lrs_pnp_preset_matches_main_lrs_pnp():
    # main_LRS_PnP.py:217-238
    c = lrs_pnp_preset()
    assert c.variant == "lrs_pnp"
    assert c.gamma == 0.5
    assert c.mu1 == 0.15
    assert c.mu2 == 0.15 * 6
    assert c.outer_iters == 2
    assert c.block_size == 36 and c.stride == 36
    assert c.sparse.n_iter == 80
    assert c.sparse.alpha_mode == "specnorm"
    assert c.sparse.h_scale == 0.1
    assert c.sparse.lambda_ista == 0.1
    assert c.dip is None


def test_dip_preset_matches_main_dip_pro():
    # main_LRS_PnP_DIP_pro.py:324-353, 229-231
    c = dip_preset()
    assert c.variant == "dip"
    assert c.gamma == 0.5
    assert c.mu1 == 0.1 and c.mu2 == 0.1
    assert c.outer_iters == 250
    assert c.sparse.n_iter == 100
    assert c.sparse.alpha_mode == "trace4"
    assert c.sparse.h_scale == 1.0
    assert c.dip.num_iter == 5000
    assert c.dip.learning_rate == 0.1
    assert c.dip.show_every == 1
    assert c.dip.buffer_size == 30
    assert c.dip.patience == 60


def test_dip_1lip_preset():
    c = dip_1lip_preset()
    assert c.variant == "dip_1lip"
    assert c.ln_lambda == 1.0
    assert c.dip.num_iter == 5000


def test_preset_overrides():
    c = dip_preset(outer_iters=10, seed=7)
    assert c.outer_iters == 10 and c.seed == 7


def test_dip_fast_preset_is_tuned_plus_bf16():
    """`dip_fast` = `dip_tuned` with every MXU path in bfloat16 and
    nothing else changed (the serve-with-throughput preset)."""
    fast, tuned = dip_fast_preset(), dip_tuned_preset()
    assert fast.sparse.matmul_dtype == "bfloat16"
    assert fast.dip.compute_dtype == "bfloat16"
    import dataclasses

    assert fast.dip.es_mode == "incremental"
    f32_sparse = dataclasses.replace(fast.sparse, matmul_dtype="float32")
    f32_dip = dataclasses.replace(
        fast.dip, compute_dtype="float32", es_mode="exact"
    )
    assert dataclasses.replace(fast, sparse=f32_sparse, dip=f32_dip) == tuned
    assert PRESETS["dip_fast"]().sparse.matmul_dtype == "bfloat16"
