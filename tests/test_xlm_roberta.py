"""XLM-Roberta text tower parity vs the reference torch implementation.

Fixture from tools/dev/make_golden_xlm.py (reference XLMRobertaWithHead,
wan/modules/xlm_roberta.py + clip.py:303-325).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.models.xlm_roberta import (
    init_xlm_roberta,
    xlm_roberta_apply,
    xlm_roberta_state_dict_to_params,
    xlm_roberta_with_head_apply,
)

GOLDEN = Path(__file__).parent / "golden" / "xlm_tiny.npz"


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "run tools/dev/make_golden_xlm.py"
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    return xlm_roberta_state_dict_to_params(sd)


def test_hidden_parity(golden, params):
    ids = jnp.asarray(golden["ids"], jnp.int32)
    out = xlm_roberta_apply(params, ids, num_heads=4)
    np.testing.assert_allclose(
        np.asarray(out), golden["hidden"], rtol=2e-4, atol=2e-5
    )


def test_pooled_head_parity(golden, params):
    ids = jnp.asarray(golden["ids"], jnp.int32)
    out = xlm_roberta_with_head_apply(params, ids, num_heads=4)
    np.testing.assert_allclose(
        np.asarray(out), golden["pooled"], rtol=2e-4, atol=2e-5
    )


def test_pad_invariance(params, golden):
    """Extra pad tokens must not change non-pad hidden states or the pooled
    output (mask + position-id convention)."""
    ids = jnp.asarray(golden["ids"], jnp.int32)
    longer = jnp.concatenate([ids, jnp.full((2, 4), 1, jnp.int32)], axis=1)
    out = xlm_roberta_with_head_apply(params, ids, num_heads=4)
    out_l = xlm_roberta_with_head_apply(params, longer, num_heads=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_l), rtol=1e-5, atol=1e-6)


def test_random_init_shapes():
    p = init_xlm_roberta(jax.random.PRNGKey(0), vocab_size=32, max_seq_len=16,
                         dim=32, num_heads=4, num_layers=2, out_dim=8)
    ids = jnp.array([[0, 3, 5, 2, 1, 1]], jnp.int32)
    h = xlm_roberta_apply(p, ids, num_heads=4)
    assert h.shape == (1, 6, 32)
    y = xlm_roberta_with_head_apply(p, ids, num_heads=4)
    assert y.shape == (1, 8) and bool(jnp.isfinite(y).all())
