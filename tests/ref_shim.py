"""Test-only import shims for the read-only torch reference.

Golden-parity tests (tests/test_golden_parity.py) instantiate the
reference's OWN torch modules from /root/reference/GLM_modules and compare
them numerically against our JAX rebuild through the real checkpoint
converters.  Three reference dependencies are absent from this image and
are stubbed here:

- ``torchaudio``: only touched at import time (file_utils.py:20) or on
  code paths the tests do not take (audio loading); ``transforms.Spectrogram``
  is given a faithful torch.stft implementation because the MRD
  discriminator (hifigan/discriminator.py:90) uses it at runtime.
- ``omegaconf``: flow.py:20 imports DictConfig purely as a constructor-arg
  container for cfm_params.
- ``matcha``: third_party/Matcha-TTS is an empty submodule in the
  reference checkout.  The handful of blocks cosyvoice/flow/decoder.py:21-22
  imports are re-implemented below following the public Matcha-TTS /
  diffusers semantics (SinusoidalPosEmb scale=1000, Block1D =
  conv3-groupnorm8-mish, ResnetBlock1D with mish time-MLP,
  Downsample1D conv k3 s2 p1, Upsample1D convT k4 s2 p1,
  TimestepEmbedding linear-silu-linear, BasicTransformerBlock =
  LN -> self-attn -> LN -> FF).  These shims exist ONLY so the reference
  decoder can run for parity testing.
"""

from __future__ import annotations

import importlib.machinery
import math
import sys
import types

REFERENCE_PATH = "/root/reference/GLM_modules"


def _module(name: str) -> types.ModuleType:
    """Stub module with a real ModuleSpec so importlib.util.find_spec
    (e.g. transformers' _is_package_available) doesn't choke on it."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    mod.__version__ = "0.0.0-stub"
    return mod


def _install_torchaudio():
    import torch

    ta = _module("torchaudio")
    transforms = _module("torchaudio.transforms")
    functional = _module("torchaudio.functional")
    compliance = _module("torchaudio.compliance")
    kaldi = _module("torchaudio.compliance.kaldi")

    class Spectrogram(torch.nn.Module):
        """torchaudio.transforms.Spectrogram via torch.stft (magnitude)."""

        def __init__(self, n_fft=400, win_length=None, hop_length=None,
                     pad=0, window_fn=torch.hann_window, power=2.0,
                     normalized=False, center=True, pad_mode="reflect",
                     onesided=True, **kw):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length or n_fft
            self.hop_length = hop_length or self.n_fft // 2
            self.power = power
            self.center = center
            self.pad_mode = pad_mode
            self.normalized = normalized
            self.onesided = onesided
            self.register_buffer("window", window_fn(self.win_length))

        def forward(self, waveform):
            spec = torch.stft(
                waveform, self.n_fft, self.hop_length, self.win_length,
                window=self.window, center=self.center,
                pad_mode=self.pad_mode, normalized=self.normalized,
                onesided=self.onesided, return_complex=True)
            if self.power is None:
                return torch.view_as_real(spec)
            return spec.abs() ** self.power

    class Resample(torch.nn.Module):
        def __init__(self, orig_freq=16000, new_freq=16000, **kw):
            super().__init__()
            self.orig_freq, self.new_freq = orig_freq, new_freq

        def forward(self, waveform):
            raise NotImplementedError("torchaudio stub: Resample")

    def _unavailable(*a, **k):
        raise NotImplementedError("torchaudio stub: IO not available")

    transforms.Spectrogram = Spectrogram
    transforms.Resample = Resample
    ta.transforms = transforms
    ta.functional = functional
    ta.compliance = compliance
    compliance.kaldi = kaldi
    kaldi.fbank = _unavailable
    ta.load = _unavailable
    ta.save = _unavailable
    ta.info = _unavailable
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = transforms
    sys.modules["torchaudio.functional"] = functional
    sys.modules["torchaudio.compliance"] = compliance
    sys.modules["torchaudio.compliance.kaldi"] = kaldi


def _install_omegaconf():
    om = _module("omegaconf")

    class DictConfig(dict):
        """Attribute-style dict (constructor-arg container only)."""

        def __init__(self, content=None, **kw):
            super().__init__(content or {}, **kw)

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def get(self, k, default=None):
            return dict.get(self, k, default)

    om.DictConfig = DictConfig
    om.OmegaConf = types.SimpleNamespace(create=DictConfig)
    sys.modules["omegaconf"] = om


def _install_matcha():
    import torch
    from torch import nn

    matcha = _module("matcha")
    models = _module("matcha.models")
    components = _module("matcha.models.components")
    decoder_mod = _module("matcha.models.components.decoder")
    transformer_mod = _module("matcha.models.components.transformer")
    flow_matching_mod = _module("matcha.models.components.flow_matching")

    class BASECFM(nn.Module):
        """matcha flow_matching.BASECFM: parameter container base class."""

        def __init__(self, n_feats, cfm_params, n_spks=1, spk_emb_dim=128):
            super().__init__()
            self.n_feats = n_feats
            self.n_spks = n_spks
            self.spk_emb_dim = spk_emb_dim
            self.solver = cfm_params.solver
            self.sigma_min = getattr(cfm_params, "sigma_min", 1e-4)
            self.estimator = None

    flow_matching_mod.BASECFM = BASECFM

    class SinusoidalPosEmb(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.dim = dim

        def forward(self, x, scale=1000):
            if x.ndim < 1:
                x = x.unsqueeze(0)
            half_dim = self.dim // 2
            emb = math.log(10000) / (half_dim - 1)
            emb = torch.exp(
                torch.arange(half_dim, device=x.device).float() * -emb)
            emb = scale * x.unsqueeze(1) * emb.unsqueeze(0)
            return torch.cat((emb.sin(), emb.cos()), dim=-1)

    class Block1D(nn.Module):
        def __init__(self, dim, dim_out, groups=8):
            super().__init__()
            self.block = nn.Sequential(
                nn.Conv1d(dim, dim_out, 3, padding=1),
                nn.GroupNorm(groups, dim_out),
                nn.Mish(),
            )

        def forward(self, x, mask):
            return self.block(x * mask) * mask

    class ResnetBlock1D(nn.Module):
        def __init__(self, dim, dim_out, time_emb_dim, groups=8):
            super().__init__()
            self.mlp = nn.Sequential(nn.Mish(),
                                     nn.Linear(time_emb_dim, dim_out))
            self.block1 = Block1D(dim, dim_out, groups=groups)
            self.block2 = Block1D(dim_out, dim_out, groups=groups)
            self.res_conv = nn.Conv1d(dim, dim_out, 1)

        def forward(self, x, mask, time_emb):
            h = self.block1(x, mask)
            h = h + self.mlp(time_emb).unsqueeze(-1)
            h = self.block2(h, mask)
            return h + self.res_conv(x * mask)

    class Downsample1D(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv = nn.Conv1d(dim, dim, 3, 2, 1)

        def forward(self, x):
            return self.conv(x)

    class Upsample1D(nn.Module):
        def __init__(self, channels, use_conv=False, use_conv_transpose=True,
                     out_channels=None, name="conv"):
            super().__init__()
            self.channels = channels
            self.out_channels = out_channels or channels
            assert use_conv_transpose
            self.conv = nn.ConvTranspose1d(channels, self.out_channels,
                                           4, 2, 1)

        def forward(self, x):
            return self.conv(x)

    class TimestepEmbedding(nn.Module):
        def __init__(self, in_channels, time_embed_dim, act_fn="silu",
                     out_dim=None, post_act_fn=None, cond_proj_dim=None):
            super().__init__()
            assert act_fn == "silu" and post_act_fn is None
            self.linear_1 = nn.Linear(in_channels, time_embed_dim)
            self.act = nn.SiLU()
            self.linear_2 = nn.Linear(time_embed_dim,
                                      out_dim or time_embed_dim)

        def forward(self, sample):
            return self.linear_2(self.act(self.linear_1(sample)))

    class _GELU(nn.Module):
        """diffusers GELU: Linear proj then exact gelu."""

        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out)

        def forward(self, x):
            return torch.nn.functional.gelu(self.proj(x))

    class _SnakeBeta(nn.Module):
        """matcha transformer.py SnakeBeta FF activation (proj + snake-beta
        with log-scale alpha/beta)."""

        def __init__(self, in_features, out_features):
            super().__init__()
            self.proj = nn.Linear(in_features, out_features)
            self.alpha = nn.Parameter(torch.zeros(out_features))
            self.beta = nn.Parameter(torch.zeros(out_features))

        def forward(self, x):
            x = self.proj(x)
            alpha = torch.exp(self.alpha)
            beta = torch.exp(self.beta)
            return x + (1.0 / (beta + 1e-9)) * torch.sin(x * alpha) ** 2

    class _FeedForward(nn.Module):
        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu"):
            super().__init__()
            inner = int(dim * mult)
            dim_out = dim_out or dim
            if activation_fn == "gelu":
                act = _GELU(dim, inner)
            elif activation_fn == "snakebeta":
                act = _SnakeBeta(dim, inner)
            else:
                raise NotImplementedError(
                    f"matcha shim: activation_fn={activation_fn}")
            self.net = nn.ModuleList(
                [act, nn.Dropout(dropout), nn.Linear(inner, dim_out)])

        def forward(self, x):
            for layer in self.net:
                x = layer(x)
            return x

    class _Attention(nn.Module):
        """diffusers self-attention: bias-free qkv, additive float mask."""

        def __init__(self, query_dim, heads, dim_head, dropout=0.0):
            super().__init__()
            inner = heads * dim_head
            self.heads = heads
            self.scale = dim_head ** -0.5
            self.to_q = nn.Linear(query_dim, inner, bias=False)
            self.to_k = nn.Linear(query_dim, inner, bias=False)
            self.to_v = nn.Linear(query_dim, inner, bias=False)
            self.to_out = nn.ModuleList(
                [nn.Linear(inner, query_dim), nn.Dropout(dropout)])

        def forward(self, hidden_states, attention_mask=None):
            b, t, _ = hidden_states.shape
            h = self.heads

            def split(x):
                return (x.reshape(b, t, h, -1).permute(0, 2, 1, 3)
                        .reshape(b * h, t, -1))

            q = split(self.to_q(hidden_states))
            k = split(self.to_k(hidden_states))
            v = split(self.to_v(hidden_states))
            scores = torch.bmm(q, k.transpose(1, 2)) * self.scale
            if attention_mask is not None:
                if attention_mask.ndim == 3:          # (B, Tq, Tk) float bias
                    mask = attention_mask.repeat_interleave(h, dim=0)
                else:
                    mask = attention_mask
                scores = scores + mask
            attn = scores.softmax(dim=-1)
            out = torch.bmm(attn, v)
            out = (out.reshape(b, h, t, -1).permute(0, 2, 1, 3)
                   .reshape(b, t, -1))
            out = self.to_out[0](out)
            return self.to_out[1](out)

    class BasicTransformerBlock(nn.Module):
        def __init__(self, dim, num_attention_heads, attention_head_dim,
                     dropout=0.0, activation_fn="geglu", **kw):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)
            self.attn1 = _Attention(dim, num_attention_heads,
                                    attention_head_dim, dropout)
            self.norm3 = nn.LayerNorm(dim)
            self.ff = _FeedForward(dim, dropout=dropout,
                                   activation_fn=activation_fn)

        def forward(self, hidden_states, attention_mask=None,
                    encoder_hidden_states=None, encoder_attention_mask=None,
                    timestep=None, **kw):
            attn_out = self.attn1(self.norm1(hidden_states),
                                  attention_mask=attention_mask)
            hidden_states = hidden_states + attn_out
            ff_out = self.ff(self.norm3(hidden_states))
            return hidden_states + ff_out

    decoder_mod.SinusoidalPosEmb = SinusoidalPosEmb
    decoder_mod.Block1D = Block1D
    decoder_mod.ResnetBlock1D = ResnetBlock1D
    decoder_mod.Downsample1D = Downsample1D
    decoder_mod.Upsample1D = Upsample1D
    decoder_mod.TimestepEmbedding = TimestepEmbedding
    transformer_mod.BasicTransformerBlock = BasicTransformerBlock

    matcha.models = models
    models.components = components
    components.decoder = decoder_mod
    components.transformer = transformer_mod
    sys.modules["matcha"] = matcha
    sys.modules["matcha.models"] = models
    sys.modules["matcha.models.components"] = components
    sys.modules["matcha.models.components.decoder"] = decoder_mod
    sys.modules["matcha.models.components.transformer"] = transformer_mod
    sys.modules["matcha.models.components.flow_matching"] = flow_matching_mod


_installed = False


def install():
    """Idempotent: add the reference to sys.path and stub its missing deps."""
    global _installed
    if _installed:
        return
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "torchaudio" not in sys.modules:
        _install_torchaudio()
    if "omegaconf" not in sys.modules:
        _install_omegaconf()
    if "matcha" not in sys.modules:
        _install_matcha()
    _installed = True


# ---------------------------------------------------------------------------
# Stable-audio DiT shim (x_transformers is not installed, so the reference's
# cosyvoice1/flow/stable/{dit,transformer}.py cannot import; this restates
# the EXACT exercised path — transformer_type='continuous_transformer',
# global_cond_type='prepend', no cross-attend/adaLN/conformer — for golden
# parity against models/flow/dit.py.  Cites are into those two files.)
# ---------------------------------------------------------------------------

def build_torch_stable_dit(io_channels=80, embed_dim=128, depth=2,
                           num_heads=2, spk_embed_dim=12, ff_mult=4,
                           timestep_features_dim=256):
    import torch
    from torch import nn
    from torch.nn import functional as F

    class LayerNorm(nn.Module):                   # transformer.py:174-194
        def __init__(self, dim):
            super().__init__()
            self.gamma = nn.Parameter(torch.ones(dim))
            self.register_buffer("beta", torch.zeros(dim))

        def forward(self, x):
            return F.layer_norm(x, x.shape[-1:], weight=self.gamma,
                                bias=self.beta)

    class GLU(nn.Module):                         # transformer.py:197-219
        def __init__(self, dim_in, dim_out):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out * 2)

        def forward(self, x):
            x, gate = self.proj(x).chunk(2, dim=-1)
            return x * F.silu(gate)

    class FeedForward(nn.Module):                 # transformer.py:222-269
        def __init__(self, dim, mult):
            super().__init__()
            inner = int(dim * mult)
            self.ff = nn.Sequential(GLU(dim, inner), nn.Identity(),
                                    nn.Linear(inner, dim), nn.Identity())

        def forward(self, x):
            return self.ff(x)

    def rotate_half(t):                           # transformer.py:146-150
        j = t.shape[-1] // 2
        x1, x2 = t[..., :j], t[..., j:]
        return torch.cat((-x2, x1), dim=-1)

    class Attention(nn.Module):                   # transformer.py:272-545
        def __init__(self, dim, dim_heads):
            super().__init__()
            self.h = dim // dim_heads
            self.to_qkv = nn.Linear(dim, dim * 3, bias=False)
            self.to_out = nn.Linear(dim, dim, bias=False)

        def forward(self, x, freqs):
            b, n, d = x.shape
            q, k, v = self.to_qkv(x).chunk(3, dim=-1)
            def heads(t):
                return t.reshape(b, n, self.h, -1).transpose(1, 2)
            q, k, v = heads(q), heads(k), heads(v)
            rot = freqs.shape[-1]
            def rope(t):                          # transformer.py:153-171
                tr, tu = t[..., :rot].float(), t[..., rot:]
                tr = tr * freqs.cos() + rotate_half(tr) * freqs.sin()
                return torch.cat((tr.to(t.dtype), tu), dim=-1)
            q, k = rope(q), rope(k)
            scale = 1.0 / (q.shape[-1] ** 0.5)    # transformer.py:514-535
            dots = torch.einsum("bhid,bhjd->bhij", q, k) * scale
            attn = F.softmax(dots, dim=-1, dtype=torch.float32).to(
                dots.dtype)
            out = torch.einsum("bhij,bhjd->bhid", attn, v)
            out = out.transpose(1, 2).reshape(b, n, d)
            return self.to_out(out)

    class TransformerBlock(nn.Module):            # transformer.py:589-705
        def __init__(self, dim, dim_heads, mult):
            super().__init__()
            self.pre_norm = LayerNorm(dim)
            self.self_attn = Attention(dim, dim_heads)
            self.ff_norm = LayerNorm(dim)
            self.ff = FeedForward(dim, mult)

        def forward(self, x, freqs):
            x = x + self.self_attn(self.pre_norm(x), freqs)
            x = x + self.ff(self.ff_norm(x))
            return x

    class ContinuousTransformer(nn.Module):       # transformer.py:705-831
        def __init__(self, dim, depth, dim_heads, dim_in, dim_out, mult):
            super().__init__()
            self.project_in = nn.Linear(dim_in, dim, bias=False)
            self.project_out = nn.Linear(dim, dim_out, bias=False)
            rot = max(dim_heads // 2, 32)
            inv = 1.0 / (10000.0 ** (torch.arange(0, rot, 2).float()
                                     / rot))
            self.register_buffer("inv_freq", inv)
            self.layers = nn.ModuleList(
                [TransformerBlock(dim, dim_heads, mult)
                 for _ in range(depth)])

        def forward(self, x, prepend_embeds):
            x = self.project_in(x)
            x = torch.cat((prepend_embeds, x), dim=-2)
            t = torch.arange(x.shape[1], device=x.device).float()
            freqs = torch.einsum("i,j->ij", t, self.inv_freq)
            freqs = torch.cat((freqs, freqs), dim=-1)  # transformer.py:134
            for layer in self.layers:
                x = layer(x, freqs)
            return self.project_out(x)

    class FourierFeatures(nn.Module):             # stable/blocks.py
        def __init__(self, in_features, out_features):
            super().__init__()
            self.weight = nn.Parameter(
                torch.randn(out_features // 2, in_features))

        def forward(self, x):
            f = 2 * math.pi * x @ self.weight.T
            return torch.cat([f.cos(), f.sin()], dim=-1)

    class DiffusionTransformer(nn.Module):        # dit.py:15-258
        def __init__(self):
            super().__init__()
            dim_in = io_channels * 2              # x ++ input_concat_cond
            self.timestep_features = FourierFeatures(
                1, timestep_features_dim)
            self.to_timestep_embed = nn.Sequential(
                nn.Linear(timestep_features_dim, embed_dim, bias=True),
                nn.SiLU(), nn.Linear(embed_dim, embed_dim, bias=True))
            self.to_global_embed = nn.Sequential(
                nn.Linear(spk_embed_dim, embed_dim, bias=False),
                nn.SiLU(), nn.Linear(embed_dim, embed_dim, bias=False))
            self.transformer = ContinuousTransformer(
                embed_dim, depth, embed_dim // num_heads, dim_in,
                io_channels, ff_mult)
            self.preprocess_conv = nn.Conv1d(dim_in, dim_in, 1,
                                             bias=False)
            nn.init.zeros_(self.preprocess_conv.weight)
            self.postprocess_conv = nn.Conv1d(io_channels, io_channels,
                                              1, bias=False)
            nn.init.zeros_(self.postprocess_conv.weight)

        def forward(self, x, t, global_embed, input_concat_cond):
            """x/input_concat_cond (B, C, T); t (B,); global (B, spk) —
            dit.py:157-258 (prepend path)."""
            global_embed = self.to_global_embed(global_embed)
            x = torch.cat([x, input_concat_cond], dim=1)
            timestep_embed = self.to_timestep_embed(
                self.timestep_features(t[:, None]))
            global_embed = global_embed + timestep_embed
            prepend_inputs = global_embed.unsqueeze(1)
            x = self.preprocess_conv(x) + x
            x = x.transpose(1, 2)
            out = self.transformer(x, prepend_inputs)
            out = out.transpose(1, 2)[:, :, 1:]
            return self.postprocess_conv(out) + out

    return DiffusionTransformer()


def install_cosyvoice1_block():
    """Make the cosyvoice1 fork's block-conformer importable: the fork is
    written to be installed AS ``cosyvoice`` (its modules import
    ``cosyvoice.utils.block_mask_util`` and register
    ``block_rel_selfattn``, cosyvoice1/transformer/attention.py:471,
    utils/class_utils.py:71) — graft those two pieces onto the loaded v2
    namespace so the torch module runs for golden tests."""
    import importlib.util

    install()
    if "cosyvoice.utils.block_mask_util" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "cosyvoice.utils.block_mask_util",
            REFERENCE_PATH + "/cosyvoice1/utils/block_mask_util.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["cosyvoice.utils.block_mask_util"] = mod
        import cosyvoice.utils
        cosyvoice.utils.block_mask_util = mod
    import cosyvoice.utils.class_utils as cu
    from cosyvoice1.transformer.attention import (
        BlockRelPositionMultiHeadedAttention)
    cu.COSYVOICE_ATTENTION_CLASSES.setdefault(
        "block_rel_selfattn", BlockRelPositionMultiHeadedAttention)
