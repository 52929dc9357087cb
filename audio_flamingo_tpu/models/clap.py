"""CLAP / HTSAT audio tower (AF1/AF2 encoder): Swin-transformer over log-mel images.

Architecture reference (golden-tested): [hf] models/clap/modeling_clap.py —
patch embed :265-363, Swin window attention + relative position bias :364-459,
layer w/ cyclic shift :542-667, patch merging :729-781, encoder + mel->img reshape
:783-978, AFF fusion block :225-264, projection :980-998, get_audio_features :1650-1685.

TPU-first deltas: static spec_size (256x256) so every stage resolution divides the window
— no dynamic padding; window masks and relative-position indices are host-precomputed
constants; the bicubic time-interpolation is a constant matrix matmul (MXU) instead of an
image-resize op; BatchNorm runs in eval mode from checkpoint statistics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from audio_flamingo_tpu.config import ClapAudioConfig
from audio_flamingo_tpu.ops import layer_norm
from audio_flamingo_tpu.ops.mlp import gelu_mlp

NEG = -100.0  # Swin shifted-window mask value ([hf] modeling_clap.py:588)


# ------------------------------------------------------------------ host-side constants

def bicubic_interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Torch bicubic align_corners=True 1D interpolation as a matrix [n_out, n_in]."""
    a = -0.75

    def cubic(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
        if x < 2:
            return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
        return 0.0

    w = np.zeros((n_out, n_in), np.float64)
    if n_out == 1:
        w[0, 0] = 1.0
        return w
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        f = int(np.floor(src))
        for k in range(-1, 3):
            idx = min(max(f + k, 0), n_in - 1)
            w[i, idx] += cubic(src - (f + k))
    return w


def relative_position_index(window: int) -> np.ndarray:
    """[w*w, w*w] indices into the (2w-1)^2 bias table ([hf] modeling_clap.py:383-394)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def shifted_window_mask(height: int, width: int, window: int, shift: int) -> np.ndarray:
    """[num_windows, w*w, w*w] additive mask (0 / -100) for SW-MSA."""
    img = np.zeros((height, width), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(height // window, window, width // window, window)
    wins = wins.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, NEG, 0.0).astype(np.float32)


# ----------------------------------------------------------------------------- init

def _lin(rng, d_in, d_out, bias=True, scale=None):
    s = scale if scale is not None else d_in ** -0.5
    p = {"w": jax.random.normal(rng, (d_in, d_out), jnp.float32) * s * 0.5}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _block_init(rng, dim, num_heads, window, mlp_ratio):
    keys = jax.random.split(rng, 6)
    f = int(dim * mlp_ratio)
    return {
        "ln1_w": jnp.ones((dim,)), "ln1_b": jnp.zeros((dim,)),
        "q": _lin(keys[0], dim, dim), "k": _lin(keys[1], dim, dim),
        "v": _lin(keys[2], dim, dim), "o": _lin(keys[3], dim, dim),
        "bias_table": jnp.zeros(((2 * window - 1) ** 2, num_heads)),
        "ln2_w": jnp.ones((dim,)), "ln2_b": jnp.zeros((dim,)),
        "fc1": _lin(keys[4], dim, f), "fc2": _lin(keys[5], f, dim),
    }


def _bn_init(c):
    return {"mean": jnp.zeros((c,)), "var": jnp.ones((c,)),
            "w": jnp.ones((c,)), "b": jnp.zeros((c,))}


def init(rng: jax.Array, cfg: ClapAudioConfig) -> dict:
    keys = jax.random.split(rng, 64)
    ki = iter(keys)
    grid = cfg.spec_size // cfg.patch_stride
    d0 = cfg.patch_embed_dim
    # the proj conv always sees 1 channel: in fusion mode the 3 local crops go through
    # mel_conv2d + AFF, the global mel through proj ([hf] modeling_clap.py:313-350)
    in_ch = 1
    params: dict = {
        "batch_norm": _bn_init(cfg.num_mel_bins),
        "patch_embed": {
            "proj_w": jax.random.normal(next(ki), (cfg.patch_size, cfg.patch_size, in_ch, d0))
            * 0.02,
            "proj_b": jnp.zeros((d0,)),
            "norm_w": jnp.ones((d0,)), "norm_b": jnp.zeros((d0,)),
        },
        "stages": [],
        "norm_w": jnp.ones((d0 * 2 ** (len(cfg.depths) - 1),)),
        "norm_b": jnp.zeros((d0 * 2 ** (len(cfg.depths) - 1),)),
    }
    if cfg.enable_fusion:
        inter = d0 // 4
        params["patch_embed"]["mel_conv_w"] = jax.random.normal(
            next(ki), (cfg.patch_size, cfg.patch_size * 3, 1, d0)) * 0.02
        params["patch_embed"]["mel_conv_b"] = jnp.zeros((d0,))
        params["patch_embed"]["aff"] = {
            "local": {"c1": _lin(next(ki), d0, inter), "bn1": _bn_init(inter),
                      "c2": _lin(next(ki), inter, d0), "bn2": _bn_init(d0)},
            "global": {"c1": _lin(next(ki), d0, inter), "bn1": _bn_init(inter),
                       "c2": _lin(next(ki), inter, d0), "bn2": _bn_init(d0)},
        }
    for i, depth in enumerate(cfg.depths):
        dim = d0 * 2 ** i
        stage = {"blocks": [
            _block_init(next(ki), dim, cfg.num_heads[i], cfg.window_size, cfg.mlp_ratio)
            for _ in range(depth)
        ]}
        if i < len(cfg.depths) - 1:
            stage["downsample"] = {
                "norm_w": jnp.ones((4 * dim,)), "norm_b": jnp.zeros((4 * dim,)),
                "reduction": _lin(next(ki), 4 * dim, 2 * dim, bias=False),
            }
        params["stages"].append(stage)
    # ClapModel audio projection (hidden -> proj -> relu -> proj)
    feat = d0 * 2 ** (len(cfg.depths) - 1)
    params["projection"] = {"fc1": _lin(next(ki), feat, cfg.projection_dim),
                            "fc2": _lin(next(ki), cfg.projection_dim, cfg.projection_dim)}
    return params


# -------------------------------------------------------------------------- forward

def _linear(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _bn(x, p, eps=1e-5):
    """Eval-mode batch norm over the last axis."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return ((x.astype(jnp.float32) - p["mean"]) * inv * p["w"] + p["b"]).astype(x.dtype)


def _window_attention(x, bp, num_heads, window, rel_idx, mask):
    """x: [nW, w*w, C]; mask: [num_win_types, w*w, w*w] or None."""
    nw, t, c = x.shape
    hd = c // num_heads
    q = _linear(x, bp["q"]).reshape(nw, t, num_heads, hd)
    k = _linear(x, bp["k"]).reshape(nw, t, num_heads, hd)
    v = _linear(x, bp["v"]).reshape(nw, t, num_heads, hd)
    scores = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (hd ** -0.5)
    bias = bp["bias_table"][rel_idx.reshape(-1)].reshape(t, t, num_heads)
    scores = scores + bias.transpose(2, 0, 1)[None].astype(scores.dtype)
    if mask is not None:
        n_types = mask.shape[0]
        scores = scores.reshape(nw // n_types, n_types, num_heads, t, t)
        scores = scores + mask[None, :, None].astype(scores.dtype)
        scores = scores.reshape(nw, num_heads, t, t)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", probs, v, preferred_element_type=jnp.float32)
    return _linear(out.reshape(nw, t, c).astype(x.dtype), bp["o"])


def _swin_block(x, bp, h, w, num_heads, window, shift, rel_idx, mask):
    """x: [B, H*W, C]."""
    b, _, c = x.shape
    shortcut = x
    x = layer_norm(x, bp["ln1_w"], bp["ln1_b"]).reshape(b, h, w, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    # partition windows
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window, c)
    x = _window_attention(x, bp, num_heads, window, rel_idx, mask)
    # reverse
    x = x.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x.reshape(b, h * w, c)
    hmid = layer_norm(x, bp["ln2_w"], bp["ln2_b"])
    ffn = gelu_mlp(hmid, {"fc1": bp["fc1"]["w"].astype(x.dtype), "fc1_b": bp["fc1"]["b"],
                          "fc2": bp["fc2"]["w"].astype(x.dtype), "fc2_b": bp["fc2"]["b"]})
    return x + ffn


def _patch_merge(x, dp, h, w):
    b, _, c = x.shape
    x = x.reshape(b, h, w, c)
    x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                         x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
    x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
    x = layer_norm(x, dp["norm_w"], dp["norm_b"])
    return _linear(x, dp["reduction"])


def reshape_mel2img(x: jnp.ndarray, cfg: ClapAudioConfig, interp: jnp.ndarray) -> jnp.ndarray:
    """[B, C, T, F] normalized mels -> [B, C, spec, spec] ([hf] modeling_clap.py:824-858)."""
    b, c, t, f = x.shape
    freq_ratio = cfg.spec_size // cfg.num_mel_bins
    spec_w = cfg.spec_size * freq_ratio
    if t != spec_w:
        x = jnp.einsum("ot,bctf->bcof", interp.astype(x.dtype), x)
    x = x.reshape(b, c * freq_ratio, spec_w // freq_ratio, f)
    x = x.transpose(0, 1, 3, 2)
    return x.reshape(b, c, f * freq_ratio, spec_w // freq_ratio)


def _aff(hidden, residual, ap):
    """Attentional feature fusion on [B, H, W, C] ([hf] modeling_clap.py:225-264)."""
    x = hidden + residual
    loc = _bn(_linear(x, ap["local"]["c1"]), ap["local"]["bn1"])
    loc = _bn(_linear(jax.nn.relu(loc), ap["local"]["c2"]), ap["local"]["bn2"])
    g = x.mean(axis=(1, 2), keepdims=True)
    gl = _bn(_linear(g, ap["global"]["c1"]), ap["global"]["bn1"])
    gl = _bn(_linear(jax.nn.relu(gl), ap["global"]["c2"]), ap["global"]["bn2"])
    gate = jax.nn.sigmoid(loc + gl)
    return 2 * hidden * gate + 2 * residual * (1 - gate)


class ClapAudioTower:
    """Holds host-precomputed constants; `encode` is the jittable forward."""

    def __init__(self, cfg: ClapAudioConfig):
        self.cfg = cfg
        freq_ratio = cfg.spec_size // cfg.num_mel_bins
        self.freq_ratio = freq_ratio
        grid = cfg.spec_size // cfg.patch_stride
        self.resolutions = [(grid // 2 ** i, grid // 2 ** i) for i in range(len(cfg.depths))]
        self.rel_idx = jnp.asarray(relative_position_index(cfg.window_size))
        self.masks = []
        for (h, w) in self.resolutions:
            shift = cfg.window_size // 2
            if min(h, w) <= cfg.window_size:
                self.masks.append(None)  # no shift at this resolution
            else:
                self.masks.append(jnp.asarray(shifted_window_mask(h, w, cfg.window_size, shift)))
        # built lazily per input time length
        self._interp_cache: dict[int, jnp.ndarray] = {}

    def _interp(self, t: int) -> jnp.ndarray:
        spec_w = self.cfg.spec_size * self.freq_ratio
        if t not in self._interp_cache:
            # cache NUMPY (device conversion must happen per-trace: caching a jnp array
            # created inside a jit trace would leak that trace's tracer)
            self._interp_cache[t] = bicubic_interp_matrix(t, spec_w).astype(np.float32)
        return jnp.asarray(self._interp_cache[t])

    @partial(jax.jit, static_argnums=0)
    def encode(self, params: dict, mels: jnp.ndarray,
               is_longer: jnp.ndarray | None = None) -> dict:
        """mels: [B, C, T, F] (C=1 plain / 4 fusion) -> {'pooled', 'embeds'}.

        'pooled': [B, num_features] HTSAT latent; 'embeds': [B, proj_dim] normalized CLAP
        audio embedding (projection applied), the AF1/AF2 window embedding.
        """
        cfg = self.cfg
        b, c, t, f = mels.shape
        # eval-mode BatchNorm over mel bins ([hf] modeling_clap.py:871-873)
        x = _bn(mels, params["batch_norm"])
        x = reshape_mel2img(x, cfg, self._interp(t))           # [B, C, S, S]

        # patch embed (+fusion)
        pe = params["patch_embed"]
        glob = x[:, 0:1].transpose(0, 2, 3, 1)                  # [B, S, S, 1]
        dn = jax.lax.conv_dimension_numbers(glob.shape, pe["proj_w"].shape,
                                            ("NHWC", "HWIO", "NHWC"))
        h0 = jax.lax.conv_general_dilated(glob, pe["proj_w"].astype(glob.dtype),
                                          (cfg.patch_stride, cfg.patch_stride),
                                          "VALID", dimension_numbers=dn)
        h0 = h0 + pe["proj_b"].astype(h0.dtype)
        if cfg.enable_fusion and c == 4 and is_longer is not None:
            # local branch: 3 crops through mel_conv2d, fused via AFF where is_longer
            loc = x[:, 1:].reshape(b * 3, cfg.spec_size, cfg.spec_size, 1)
            dn2 = jax.lax.conv_dimension_numbers(loc.shape, pe["mel_conv_w"].shape,
                                                 ("NHWC", "HWIO", "NHWC"))
            lh = jax.lax.conv_general_dilated(loc, pe["mel_conv_w"].astype(loc.dtype),
                                              (cfg.patch_stride, cfg.patch_stride * 3),
                                              "VALID", dimension_numbers=dn2)
            lh = lh + pe["mel_conv_b"].astype(lh.dtype)
            gh, gw, gc = h0.shape[1], h0.shape[2], h0.shape[3]
            lh = lh.reshape(b, 3, gh, lh.shape[2], gc)
            # [hf] permute((0,2,3,1,4)).flatten(3): crops concatenated crop-major along
            # width (crop0's positions, then crop1's, then crop2's)
            lh = lh.transpose(0, 2, 1, 3, 4).reshape(b, gh, -1, gc)
            pad_w = gw - lh.shape[2]
            lh = jnp.pad(lh, ((0, 0), (0, 0), (0, max(0, pad_w)), (0, 0)))[:, :, :gw]
            fused = _aff(h0, lh, pe["aff"])
            h0 = jnp.where(is_longer.reshape(b, 1, 1, 1), fused, h0)
        grid = cfg.spec_size // cfg.patch_stride
        x = h0.reshape(b, grid * grid, -1)
        x = layer_norm(x, pe["norm_w"], pe["norm_b"])

        # Swin stages
        for i, stage in enumerate(params["stages"]):
            h, w = self.resolutions[i]
            for j, bp in enumerate(stage["blocks"]):
                if min(h, w) <= cfg.window_size:
                    shift = 0
                else:
                    shift = 0 if j % 2 == 0 else cfg.window_size // 2
                mask = self.masks[i] if shift > 0 else None
                x = _swin_block(x, bp, h, w, cfg.num_heads[i], cfg.window_size, shift,
                                self.rel_idx, mask)
            if "downsample" in stage:
                x = _patch_merge(x, stage["downsample"], h, w)

        x = layer_norm(x, params["norm_w"], params["norm_b"])
        pooled = x.mean(axis=1)                                  # == AdaptiveAvgPool1d(1)
        proj = _linear(jax.nn.relu(_linear(pooled, params["projection"]["fc1"])),
                       params["projection"]["fc2"])
        embeds = proj / jnp.linalg.norm(proj, axis=-1, keepdims=True)
        return {"pooled": pooled, "embeds": embeds}
