"""Persisted kernel-tuning table (omnivideo_tpu/ops/tuning.py).

The table holds measured-winner dispatch defaults (cross-attn KV stepping,
fused qk-prep prologue, fused AdaLN) written by the on-chip A/B drivers; all
entries are performance-only (value parity is asserted by the A/Bs and by
tests/test_attention.py across modes)."""

import json

import pytest

from omnivideo_tpu.ops import tuning


@pytest.fixture
def tmp_table(tmp_path, monkeypatch):
    p = tmp_path / "tuned.json"
    monkeypatch.setenv("OMNIVIDEO_TUNED_PATH", str(p))
    tuning.reset_cache()
    yield p
    tuning.reset_cache()


def test_lookup_fallback_chain(tmp_table):
    # missing file -> hardcoded default
    assert tuning.lookup("flash_xattn_mode", "N40_Lk6144", "single") == "single"
    tmp_table.write_text(json.dumps(
        {"flash_xattn_mode": {"default": "multi", "N12_Lk6272": "single"}}))
    tuning.reset_cache()
    # exact shape key wins, then section default
    assert tuning.lookup("flash_xattn_mode", "N12_Lk6272", "x") == "single"
    assert tuning.lookup("flash_xattn_mode", "N40_Lk6144", "x") == "multi"
    # scalar section is returned as-is
    tmp_table.write_text(json.dumps({"flash_xattn_vmem_mb": 12}))
    tuning.reset_cache()
    assert tuning.lookup("flash_xattn_vmem_mb", "default", "8") == "12"


def test_env_overrides_table(tmp_table, monkeypatch):
    tmp_table.write_text(json.dumps({"flash_xattn_mode": {"default": "multi"}}))
    tuning.reset_cache()
    assert tuning.xattn_mode(40, 6144) == "multi"
    monkeypatch.setenv("FLASH_XATTN_MODE", "single")
    assert tuning.xattn_mode(40, 6144) == "single"
    monkeypatch.setenv("FLASH_XATTN_VMEM_MB", "6")
    assert tuning.xattn_vmem_mb() == 6.0


def test_write_tuned_roundtrip(tmp_table):
    tuning.write_tuned("qk_impl", "dim5120", "pallas", source="unit-test")
    table = json.loads(tmp_table.read_text())
    assert table["qk_impl"]["dim5120"] == "pallas"
    assert table["_meta"]["qk_impl.dim5120"]["source"] == "unit-test"
    # merge keeps existing entries
    tuning.write_tuned("qk_impl", "dim1536", "xla", source="unit-test")
    table = json.loads(tmp_table.read_text())
    assert table["qk_impl"] == {"dim1536": "xla", "dim5120": "pallas"}
    assert tuning.lookup("qk_impl", "dim5120", "xla") == "pallas"


def test_resolve_impl(tmp_table):
    tuning.write_tuned("qk_impl", "dim5120", "pallas", source="t")
    # explicit values pass through untouched
    assert tuning.resolve_impl("qk_impl", "xla", 5120, "tpu") == "xla"
    assert tuning.resolve_impl("qk_impl", "pallas", 1536, "cpu") == "pallas"
    # auto: table winner on tpu, xla elsewhere (fused kernels are TPU-only)
    assert tuning.resolve_impl("qk_impl", "auto", 5120, "tpu") == "pallas"
    assert tuning.resolve_impl("qk_impl", "auto", 5120, "cpu") == "xla"
    assert tuning.resolve_impl("qk_impl", "auto", 1536, "tpu") == "xla"


def test_persist_winner_margin_and_write(tmp_table):
    cur = ("single", "xla", "xla")
    fast = ("multi", "xla", "pallas")
    # within the 1% noise margin -> no write
    assert tuning.persist_winner({cur: 1.000, fast: 0.995}, 5120, 40, 6144,
                                 source="t") == []
    # decisive winner -> both differing knobs written, ew (same) untouched
    written = tuning.persist_winner({cur: 1.000, fast: 0.90}, 5120, 40, 6144,
                                    source="t")
    assert ("flash_xattn_mode", "N40_Lk6144", "multi") in written
    assert ("qk_impl", "dim5120", "pallas") in written
    assert all(sec != "ew_impl" for sec, _, _ in written)
    # resolved defaults now reflect the winner; re-running is a no-op
    assert tuning.xattn_mode(40, 6144) == "multi"
    assert tuning.persist_winner({cur: 1.000, fast: 0.90}, 5120, 40, 6144,
                                 source="t") == []
    # other shapes unaffected
    assert tuning.xattn_mode(12, 6272) == "single"


def test_persist_winner_current_best_no_write(tmp_table):
    cur = ("single", "xla", "xla")
    assert tuning.persist_winner({cur: 0.5, ("multi", "xla", "xla"): 0.9},
                                 5120, 40, 6144, source="t") == []
    assert not tmp_table.exists()


def test_shipped_table_is_valid():
    table = json.loads(tuning.DEFAULT_PATH.read_text())
    assert table["flash_xattn_mode"]["default"] in ("single", "multi")
    assert table["qk_impl"]["default"] in ("xla", "pallas")
    assert table["ew_impl"]["default"] in ("xla", "pallas")
    float(table["flash_xattn_vmem_mb"]["default"])


def test_auto_resolution_in_dit_forward(tmp_table):
    """wan_dit_apply(qk_impl='auto') on CPU resolves to the XLA path and
    matches the explicit-'xla' forward bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from omnivideo_tpu.configs.base import WanDiTConfig
    from omnivideo_tpu.models.wan_dit import init_wan_dit, wan_dit_apply

    cfg = WanDiTConfig(dim=64, ffn_dim=128, num_heads=2, num_layers=2,
                       freq_dim=32, text_dim=32, text_len=12)
    params = init_wan_dit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 3, 8, 8))
    t = jnp.array([500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 32))
    out_auto = wan_dit_apply(params, cfg, x, t, ctx, qk_impl="auto",
                             ew_impl="auto")
    out_xla = wan_dit_apply(params, cfg, x, t, ctx, qk_impl="xla",
                            ew_impl="xla")
    assert jnp.array_equal(out_auto, out_xla)
