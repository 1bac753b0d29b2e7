"""SimpleViT in Flax (NHWC).

Re-implementation of the ``vit_pytorch.SimpleViT`` architecture used via the
reference's ViT adapter (reference ``train_generator.py:21-31``:
``vit`` = patch4/dim768/depth6/heads8/mlp1024, ``simplevitsmall8`` =
patch8/dim384/depth12/heads6/mlp1536) and the timm ``vit_small`` adapter
(reference ``eval.py:24-47``).  SimpleViT = patch embed (LN-Linear-LN),
fixed 2-D sin-cos position embedding, pre-norm transformer (no dropout,
no CLS token), mean pool, linear head.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def posemb_sincos_2d(h: int, w: int, dim: int, temperature: float = 10000.0) -> np.ndarray:
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    assert dim % 4 == 0, "feature dim must be a multiple of 4 for 2d sin-cos posemb"
    omega = np.arange(dim // 4) / (dim // 4 - 1)
    omega = 1.0 / (temperature**omega)
    y = y.flatten()[:, None] * omega[None, :]
    x = x.flatten()[:, None] * omega[None, :]
    return np.concatenate([np.sin(x), np.cos(x), np.sin(y), np.cos(y)], axis=1).astype(np.float32)


class Attention(nn.Module):
    heads: int
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        x = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        attn = nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head**-0.5), axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], inner)
        return nn.Dense(dim, use_bias=False, name="to_out")(out)


class FeedForward(nn.Module):
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = nn.LayerNorm(name="norm")(x)
        x = nn.gelu(nn.Dense(self.mlp_dim, name="fc1")(x))
        return nn.Dense(dim, name="fc2")(x)


class TimmBlock(nn.Module):
    """Pre-norm transformer block with timm's parameterization (qkv bias,
    projection bias, GELU MLP)."""

    heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        head_dim = dim // self.heads
        h = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(dim * 3, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        attn = nn.softmax(jnp.einsum("bhid,bhjd->bhij", q, k) * (head_dim**-0.5), axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], dim)
        x = x + nn.Dense(dim, name="proj")(out)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.gelu(nn.Dense(int(dim * self.mlp_ratio), name="fc1")(h), approximate=False)
        return x + nn.Dense(dim, name="fc2")(h)


class VisionTransformer(nn.Module):
    """timm-semantics ViT: conv patch embed, CLS token, learned position
    embedding, pre-norm blocks, CLS head.  Matches the reference's
    ``vit_small`` factory (reference ``eval.py:24-40``:
    ``_create_vision_transformer('vit_small_patch16_224', pretrained=False,
    img_size=32, patch_size=2, embed_dim=384, depth=12, num_heads=6)``) so a
    timm state dict imports directly
    (``combat_tpu.checkpoint.torch_import.convert_timm_vit``)."""

    image_size: int = 32
    patch_size: int = 2
    num_classes: int = 10
    dim: int = 384
    depth: int = 12
    heads: int = 6
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        n = x.shape[0]
        x = nn.Conv(self.dim, (p, p), strides=(p, p), padding="VALID", name="patch_embed")(x)
        x = x.reshape(n, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.dim)), x], axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, x.shape[1], self.dim)
        )
        x = x + pos
        for i in range(self.depth):
            x = TimmBlock(self.heads, self.mlp_ratio, name=f"block{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        return nn.Dense(self.num_classes, name="head")(x[:, 0])


class SimpleViT(nn.Module):
    image_size: int = 32
    patch_size: int = 4
    num_classes: int = 10
    dim: int = 768
    depth: int = 6
    heads: int = 8
    mlp_dim: int = 1024
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.patch_size
        n, h, w, c = x.shape
        gh, gw = h // p, w // p
        # b (gh p) (gw p) c -> b (gh gw) (p p c)
        x = x.reshape(n, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5).reshape(n, gh * gw, p * p * c)
        x = nn.LayerNorm(name="patch_norm1")(x)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        x = nn.LayerNorm(name="patch_norm2")(x)
        x = x + jnp.asarray(posemb_sincos_2d(gh, gw, self.dim))[None]
        for i in range(self.depth):
            x = x + Attention(self.heads, self.dim_head, name=f"attn{i}")(x)
            x = x + FeedForward(self.mlp_dim, name=f"ff{i}")(x)
        x = nn.LayerNorm(name="final_norm")(x)
        x = x.mean(axis=1)
        return nn.Dense(self.num_classes, name="head")(x)
