"""DistilBERT classifier with swappable Bayesian heads.

Reference src/architectures/bert.py: HF ``DistilBertModel`` backbone +
2-layer head (768 -> 768 -> classes) in MAP / MC-Dropout / BBB / Rank-1
variants; the input packs (input_ids, attention_mask) as one int tensor
[B, L, 2] and the CLS token feeds the head (bert.py:46-51).

TPU-native: the DistilBERT encoder is implemented directly in flax
(post-layernorm transformer, GELU FFN, learned positions — matching the
distilbert-base-uncased architecture: dim 768, 6 layers, 12 heads) with
``jax.nn.dot_product_attention`` so XLA lowers attention to the fused TPU
kernel. Pretrained HF torch weights are converted by
:func:`load_hf_weights` when a checkpoint directory is available
(hermetic random init otherwise — fine for tests/benchmarks).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.dropout import FixableDropout
from ..ops.attention import fused_attention_available, fused_dropout_attention
from .layers import call_layer, make_dense


class DistilBertConfig:
    def __init__(
        self,
        vocab_size: int = 30522,
        dim: int = 768,
        n_layers: int = 6,
        n_heads: int = 12,
        hidden_dim: int = 3072,
        max_position_embeddings: int = 512,
        dropout: float = 0.1,
        attention_dropout: float = 0.1,
        remat: bool = False,
        fused_attention: bool = True,
    ):
        self.vocab_size = vocab_size
        self.dim = dim
        self.n_layers = n_layers
        self.n_heads = n_heads
        self.hidden_dim = hidden_dim
        self.max_position_embeddings = max_position_embeddings
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        # rematerialize each transformer block in the backward pass
        # instead of saving its activations (notably the [B,H,L,L]
        # attention probabilities the dropout path materializes): trades
        # one extra forward per block for a large cut in HBM traffic —
        # the right trade on TPU where the train step is bandwidth-bound
        # (benchmarks/results.json big_backbones roofline)
        self.remat = remat
        # when attention dropout is live, use the Pallas fused kernel
        # (ops/attention.py) on TPU instead of materializing the
        # [B, H, L, L] probabilities + mask in HBM; auto-falls back off
        # TPU or for lane-unaligned L (fused_attention_available)
        self.fused_attention = fused_attention


TINY_CONFIG = DistilBertConfig(
    vocab_size=1024, dim=64, n_layers=2, n_heads=2, hidden_dim=128
)


class TransformerBlock(nn.Module):
    """Post-LN block (DistilBERT layout: attn -> add&LN -> FFN -> add&LN).

    Dropout placement matches HF DistilBERT exactly: on the attention
    PROBABILITIES (rate ``attention_dropout``,
    transformers modeling_distilbert MultiHeadSelfAttention.dropout) and
    after the FFN's lin2 (rate ``dropout``); there is NO dropout after
    out_lin. When no attention dropout is sampled this pass, attention
    lowers through the fused ``jax.nn.dot_product_attention`` kernel.

    ``mc_dropout``: keep the block's dropouts active (rescaled,
    per-example) at eval — the reference's full-model MC-Dropout variant
    patches EVERY nn.Dropout inside the HF DistilBertModel with
    ``patch_dropout(model, False)`` (amazon/models.py:73,
    civilcomments builders), so the encoder samples at eval too."""

    dim: int
    n_heads: int
    hidden_dim: int
    dropout: float
    attention_dropout: float = 0.0
    mc_dropout: bool = False
    fused_attention: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 on TPU)

    @nn.compact
    def __call__(self, x, mask, train: bool = True):
        head_dim = self.dim // self.n_heads
        b, l, _ = x.shape

        def drop(h, rate):
            if rate <= 0:
                return h
            if self.mc_dropout:
                return FixableDropout(rate, freeze_on_eval=False)(h, train=train)
            if train:
                return nn.Dropout(rate, deterministic=False)(h)
            return h

        def proj(name):
            return nn.Dense(self.dim, name=name, dtype=self.dtype)

        q = proj("q_lin")(x).reshape(b, l, self.n_heads, head_dim)
        k = proj("k_lin")(x).reshape(b, l, self.n_heads, head_dim)
        v = proj("v_lin")(x).reshape(b, l, self.n_heads, head_dim)
        attn_mask = mask[:, None, None, :].astype(bool)
        if self.attention_dropout > 0 and (train or self.mc_dropout):
            # is_initializing: param-shape inference may trace on the CPU
            # host (utils/perf.init_on_host), where the Pallas call cannot
            # lower — the unfused branch creates the identical params.
            if (
                self.fused_attention
                and not self.is_initializing()
                and fused_attention_available(l)
            ):
                # Pallas path: probabilities, dropout mask (hardware PRNG)
                # and the PV matmul stay in VMEM; backward recomputes the
                # identical mask. The dropout STREAM differs from the
                # jax.random fallback (see ops/attention.py) — iid either
                # way, which is all dropout semantics require.
                seed = jax.random.bits(
                    self.make_rng("dropout"), (1,), jnp.uint32
                ).astype(jnp.int32)
                attn = fused_dropout_attention(
                    q, k, v, mask, seed, dropout_p=self.attention_dropout
                )
            else:
                # unfused path: drop attention probabilities like HF.
                # bf16 inputs hit the MXU; scores accumulate in fp32
                # (preferred_element_type) so the softmax is numerically
                # clean, then probs return to the compute dtype for the
                # PV matmul.
                scores = jnp.einsum(
                    "blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32
                ) / jnp.sqrt(jnp.float32(head_dim))
                scores = jnp.where(
                    attn_mask, scores, jnp.finfo(jnp.float32).min
                )
                probs = jax.nn.softmax(scores, axis=-1)
                probs = drop(probs, self.attention_dropout).astype(q.dtype)
                attn = jnp.einsum("bhlm,bmhd->blhd", probs, v)
        else:
            attn = jax.nn.dot_product_attention(q, k, v, mask=attn_mask)
        attn = attn.reshape(b, l, self.dim)
        attn = nn.Dense(self.dim, name="out_lin", dtype=self.dtype)(attn)
        # LayerNorm statistics run in fp32 regardless of compute dtype
        # (flax reduces in promoted fp32 when dtype=bf16); output returns
        # to the compute dtype so the next matmul stays on the MXU.
        x = nn.LayerNorm(name="sa_layer_norm", dtype=self.dtype)(x + attn)

        h = nn.Dense(self.hidden_dim, name="lin1", dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="lin2", dtype=self.dtype)(h)
        h = drop(h, self.dropout)
        return nn.LayerNorm(name="output_layer_norm", dtype=self.dtype)(x + h)


class DistilBertEncoder(nn.Module):
    config: DistilBertConfig
    mc_dropout: bool = False
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 on TPU)

    @nn.compact
    def __call__(self, input_ids, attention_mask, train: bool = True):
        cfg = self.config
        tok = nn.Embed(
            cfg.vocab_size, cfg.dim, name="word_embeddings", dtype=self.dtype
        )(input_ids)
        pos_ids = jnp.arange(input_ids.shape[1])[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.dim,
            name="position_embeddings",
            dtype=self.dtype,
        )(pos_ids)
        h = nn.LayerNorm(name="embed_layer_norm", dtype=self.dtype)(tok + pos)
        if cfg.dropout > 0:
            if self.mc_dropout:
                h = FixableDropout(cfg.dropout, freeze_on_eval=False)(h, train=train)
            elif train:
                h = nn.Dropout(cfg.dropout, deterministic=False)(h)
        # static_argnums counts from self: (h, mask, train) -> train is 3
        block_cls = (
            nn.remat(TransformerBlock, static_argnums=(3,))
            if getattr(cfg, "remat", False)
            else TransformerBlock
        )
        for i in range(cfg.n_layers):
            h = block_cls(
                cfg.dim, cfg.n_heads, cfg.hidden_dim, cfg.dropout,
                attention_dropout=cfg.attention_dropout,
                mc_dropout=self.mc_dropout,
                fused_attention=getattr(cfg, "fused_attention", True),
                dtype=self.dtype, name=f"layer_{i}"
            )(h, attention_mask, train)
        return h


class BertClassifier(nn.Module):
    """Reference BertClassifier (bert.py:10-51). head_kind in
    {'map', 'drop', 'bbb', 'rank1'}; input [B, L, 2] packs
    (input_ids, attention_mask)."""

    classes: int
    head_kind: str = "map"
    drop_p: float = 0.2
    components: int = 1
    config: Optional[DistilBertConfig] = None
    # Full-model MC-Dropout (reference build_mcd default, last_layer_mcd
    # False): patch_dropout keeps the ENCODER's dropouts sampling at eval
    # too, not just the head's (amazon/models.py:67-73).
    mc_encoder_dropout: bool = False
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 on TPU)

    @nn.compact
    def __call__(self, packed_input, train: bool = True, component=None):
        cfg = self.config or DistilBertConfig()
        input_ids = packed_input[:, :, 0]
        attention_mask = packed_input[:, :, 1]
        hidden = DistilBertEncoder(
            cfg, mc_dropout=self.mc_encoder_dropout, dtype=self.dtype, name="bert"
        )(input_ids, attention_mask, train=train)
        # the head is a tiny fraction of the flops — keep it fp32 for
        # numerically clean logits under any head_kind
        cls = hidden[:, 0].astype(jnp.float32)

        kind = {"map": "plain", "drop": "plain"}.get(self.head_kind, self.head_kind)
        h = call_layer(
            make_dense(kind, cfg.dim, components=self.components), cls, train, component
        )
        h = nn.relu(h)
        # 'drop' uses MC-Dropout (active at eval); others train-only 0.2
        # (reference bert.py:19,26,33,40). The bert tasks patch dropout
        # with freeze_on_eval=False (civilcomments/models.py:69,
        # amazon/models.py:71-73) — proper per-example rescaled eval
        # dropout, unlike the from-scratch nets' frozen-mask default.
        if self.head_kind == "drop":
            h = FixableDropout(self.drop_p, freeze_on_eval=False)(h, train=train)
        elif train:
            h = nn.Dropout(0.2, deterministic=False)(h)
        return call_layer(
            make_dense(kind, self.classes, components=self.components), h, train, component
        )


def load_hf_weights(params: dict, hf_dir: str) -> dict:
    """Convert a HuggingFace distilbert-base-uncased torch checkpoint into
    this module's param tree (backbone only; heads stay at init). Returns
    a new params dict; no-op path for hermetic runs."""
    import torch

    sd = torch.load(f"{hf_dir}/pytorch_model.bin", map_location="cpu")

    def t2j(t, transpose=False):
        arr = np.asarray(t.detach().numpy(), np.float32)
        return jnp.asarray(arr.T if transpose else arr)

    bert = dict(params["bert"])
    pre = "distilbert." if any(k.startswith("distilbert.") for k in sd) else ""
    e = f"{pre}embeddings."
    bert["word_embeddings"] = {"embedding": t2j(sd[e + "word_embeddings.weight"])}
    bert["position_embeddings"] = {
        "embedding": t2j(sd[e + "position_embeddings.weight"])
    }
    bert["embed_layer_norm"] = {
        "scale": t2j(sd[e + "LayerNorm.weight"]),
        "bias": t2j(sd[e + "LayerNorm.bias"]),
    }
    n_layers = sum(1 for k in bert if k.startswith("layer_"))
    for i in range(n_layers):
        t = f"{pre}transformer.layer.{i}."
        layer = {}
        for ours, theirs in [
            ("q_lin", "attention.q_lin"),
            ("k_lin", "attention.k_lin"),
            ("v_lin", "attention.v_lin"),
            ("out_lin", "attention.out_lin"),
            ("lin1", "ffn.lin1"),
            ("lin2", "ffn.lin2"),
        ]:
            layer[ours] = {
                "kernel": t2j(sd[t + theirs + ".weight"], transpose=True),
                "bias": t2j(sd[t + theirs + ".bias"]),
            }
        for ours, theirs in [
            ("sa_layer_norm", "sa_layer_norm"),
            ("output_layer_norm", "output_layer_norm"),
        ]:
            layer[ours] = {
                "scale": t2j(sd[t + theirs + ".weight"]),
                "bias": t2j(sd[t + theirs + ".bias"]),
            }
        bert[f"layer_{i}"] = layer
    return {**params, "bert": bert}
