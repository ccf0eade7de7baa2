"""JAX Qwen3 text decoder parity against HF transformers (dense and MoE)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from omnivideo_tpu.models.qwen3vl.text_model import (
    Qwen3TextConfig,
    hf_to_params,
    qwen3_forward,
    qwen3_greedy_decode,
)


def _sd_np(m):
    return {k: v.float().numpy() for k, v in m.state_dict().items()}


@pytest.fixture(scope="module")
def dense():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128, rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = Qwen3TextConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16, rope_theta=10000.0,
    )
    return m, cfg


def test_dense_forward_parity(dense):
    m, cfg = dense
    params = hf_to_params(_sd_np(m), cfg)
    ids = torch.randint(0, 96, (1, 12), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        out = m(ids, output_hidden_states=True)
    hidden, logits = qwen3_forward(params, cfg, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(
        np.asarray(logits), out.logits.numpy(), rtol=2e-3, atol=2e-3
    )
    # hidden_states[-1] is the POST-final-norm hidden in qwen3
    np.testing.assert_allclose(
        np.asarray(hidden), out.hidden_states[-1].numpy(), rtol=2e-3, atol=2e-3
    )


def test_dense_greedy_decode_parity(dense):
    m, cfg = dense
    params = hf_to_params(_sd_np(m), cfg)
    ids = torch.randint(0, 96, (1, 8), generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        hf_out = m.generate(ids, max_new_tokens=6, do_sample=False)
    ours = qwen3_greedy_decode(params, cfg, jnp.asarray(ids.numpy()), 6)
    np.testing.assert_array_equal(np.asarray(ours)[0], hf_out[0, 8:].numpy())


def test_moe_forward_parity():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    hf_cfg = Qwen3MoeConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        decoder_sparse_step=1, rope_theta=10000.0, norm_topk_prob=True,
        tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    m = Qwen3MoeForCausalLM(hf_cfg).eval()
    cfg = Qwen3TextConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16, rope_theta=10000.0,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        norm_topk_prob=True,
    )
    params = hf_to_params(_sd_np(m), cfg)
    ids = torch.randint(0, 96, (1, 10), generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        out = m(ids)
    _, logits = qwen3_forward(params, cfg, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(
        np.asarray(logits), out.logits.numpy(), rtol=3e-3, atol=3e-3
    )

@pytest.mark.slow
def test_moe_grouped_matches_dense_oracle():
    """ragged_dot grouped-GEMM MoE == exact dense mixture, including uneven
    expert loads and batch dims."""
    import jax

    from omnivideo_tpu.models.qwen3vl.text_model import _moe, _moe_dense

    cfg = Qwen3TextConfig(
        vocab_size=8, hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=1, head_dim=16,
        num_experts=8, num_experts_per_tok=3, moe_intermediate_size=16,
        norm_topk_prob=True,
    )
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    E, D, M = 8, 32, 16
    p = {
        "gate": jax.random.normal(ks[0], (D, E)) * 0.5,
        "experts": {
            "gate": jax.random.normal(ks[1], (E, D, M)) * 0.1,
            "up": jax.random.normal(ks[2], (E, D, M)) * 0.1,
            "down": jax.random.normal(ks[3], (E, M, D)) * 0.1,
        },
    }
    x = jax.random.normal(ks[4], (2, 7, D))
    ref = _moe_dense(p, x, cfg)
    out = _moe(p, x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

    # single-token decode shape
    x1 = x[:1, :1]
    np.testing.assert_allclose(
        np.asarray(_moe(p, x1, cfg)), np.asarray(_moe_dense(p, x1, cfg)),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
def test_qwen3_forward_sp_matches_single_device():
    """Sequence-parallel forward (ring token-causal attention over a 4-device
    mesh) == the single-device forward, values and gradients."""
    import jax

    from omnivideo_tpu.models.qwen3vl.text_model import (
        qwen3_forward,
        qwen3_forward_sp,
    )
    from omnivideo_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(21)
    m = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = Qwen3TextConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        rope_theta=10000.0,
    )
    params = hf_to_params(_sd_np(m), cfg)
    mesh = create_mesh(1, 1, 4)
    ids = jnp.asarray(
        torch.randint(0, 96, (2, 32), generator=torch.Generator().manual_seed(22)).numpy()
    )
    _, ref = qwen3_forward(params, cfg, ids)
    _, sp = qwen3_forward_sp(params, cfg, ids, mesh)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ref), rtol=2e-3, atol=2e-3)

    # gradients wrt params flow through the ring
    def loss_sp(p):
        _, lg = qwen3_forward_sp(p, cfg, ids, mesh)
        return jnp.mean(jnp.square(lg))

    def loss_1d(p):
        _, lg = qwen3_forward(p, cfg, ids)
        return jnp.mean(jnp.square(lg))

    g_sp = jax.grad(loss_sp)(params)
    g_1d = jax.grad(loss_1d)(params)
    np.testing.assert_allclose(
        np.asarray(g_sp["embed"]), np.asarray(g_1d["embed"]), rtol=5e-3, atol=5e-3
    )


def test_qwen3_forward_sp_hybrid_2d():
    """2-D hybrid SP (ulysses×ring, ring-major layout) == single-device."""
    import jax

    from omnivideo_tpu.models.qwen3vl.text_model import (
        qwen3_forward,
        qwen3_forward_sp,
    )
    from omnivideo_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(31)
    m = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = Qwen3TextConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        rope_theta=10000.0,
    )
    params = hf_to_params(_sd_np(m), cfg)
    mesh = create_mesh(1, 2, 4)  # ulysses=2 × ring=4
    ids = jnp.asarray(
        torch.randint(0, 96, (2, 32), generator=torch.Generator().manual_seed(32)).numpy()
    )
    _, ref = qwen3_forward(params, cfg, ids)
    _, sp = qwen3_forward_sp(params, cfg, ids, mesh, ulysses_axis="fsdp")
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_flash_prefill_matches_dense(dense):
    """attn_impl=flash_interpret (the causal flash kernel) is numerics-
    equivalent to the dense-softmax path — the TPU serving prefill never
    materializes [B, N, L, L] logits."""
    import dataclasses

    m, cfg = dense
    params = hf_to_params(_sd_np(m), cfg)
    ids = torch.randint(0, 96, (1, 24),
                        generator=torch.Generator().manual_seed(7))
    ids = jnp.asarray(ids.numpy())
    _, ref = qwen3_forward(params, dataclasses.replace(cfg, attn_impl="dense"),
                           ids)
    _, out = qwen3_forward(
        params, dataclasses.replace(cfg, attn_impl="flash_interpret"), ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_greedy_decode_matches_dense(dense):
    """Flash prefill + cached decode emits the same tokens as dense."""
    import dataclasses

    m, cfg = dense
    params = hf_to_params(_sd_np(m), cfg)
    prompt = torch.randint(0, 96, (1, 9),
                           generator=torch.Generator().manual_seed(8))
    prompt = jnp.asarray(prompt.numpy())
    ref = qwen3_greedy_decode(
        params, dataclasses.replace(cfg, attn_impl="dense"), prompt, 6)
    out = qwen3_greedy_decode(
        params, dataclasses.replace(cfg, attn_impl="flash_interpret"),
        prompt, 6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
