"""umT5 encoder parity against reference-generated golden fixture."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnivideo_tpu.configs.base import T5Config
from omnivideo_tpu.io.torch_convert import to_jnp
from omnivideo_tpu.models.t5 import (
    init_t5,
    rel_position_buckets,
    t5_encode,
    t5_state_dict_to_params,
)

GOLDEN = Path(__file__).parent / "golden" / "t5_tiny.npz"

TINY = T5Config(
    vocab_size=100, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
    num_layers=3, num_buckets=8, shared_pos=False, text_len=16,
)


@pytest.fixture(scope="module")
def golden():
    assert GOLDEN.exists(), "run tools/dev/make_golden_t5.py"
    return np.load(GOLDEN)


def test_t5_parity(golden):
    sd = {k[len("sd::"):]: golden[k] for k in golden.files if k.startswith("sd::")}
    params = to_jnp(t5_state_dict_to_params(sd, TINY))
    out = t5_encode(params, TINY, jnp.asarray(golden["ids"]), jnp.asarray(golden["mask"]))
    np.testing.assert_allclose(np.asarray(out), golden["out"], rtol=2e-4, atol=2e-4)


def test_rel_buckets_symmetric_structure():
    b = rel_position_buckets(8, 8, num_buckets=8, max_dist=16)
    assert b.shape == (8, 8)
    assert b[0, 0] == 0
    # positive offsets land in the upper half of buckets
    assert b[0, 1] >= 4 and b[1, 0] < 4


def test_t5_init_and_mask_effect():
    cfg = TINY
    params = init_t5(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ids = jnp.arange(16, dtype=jnp.int32)[None]
    m1 = jnp.ones((1, 16), jnp.int32)
    m2 = m1.at[0, 8:].set(0)
    o1 = t5_encode(params, cfg, ids, m1)
    o2 = t5_encode(params, cfg, ids, m2)
    # masking the tail must change the valid-token representations
    assert not np.allclose(np.asarray(o1[0, :8]), np.asarray(o2[0, :8]))


def test_t5_encode_bf16_params():
    """bf16 checkpoints must encode (scan carry keeps one dtype) and track
    the f32 result — the deployment dtype of the reference T5 .pth
    (models_t5_umt5-xxl-enc-bf16)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from omnivideo_tpu.models.t5 import T5Config, init_t5, t5_encode

    cfg = T5Config(vocab_size=64, dim=32, dim_attn=32, dim_ffn=64,
                   num_heads=4, num_layers=2, num_buckets=8, text_len=16)
    ids = jnp.arange(16, dtype=jnp.int32)[None] % 64
    mask = jnp.ones((1, 16), jnp.int32)

    p32 = init_t5(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    pbf = init_t5(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    ref = t5_encode(p32, cfg, ids, mask)
    out = t5_encode(pbf, cfg, ids, mask)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=0.1, atol=0.15)
