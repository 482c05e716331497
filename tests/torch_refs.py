# Torch reconstructions of the upstream model architectures, used as
# independent numeric oracles for the JAX forwards and as state-dict name
# sources for the ONNX importer maps.
#
# Each class mirrors the *upstream* module tree (asteroid, pyannote.audio,
# wespeaker, 3D-Speaker, silero, Microsoft DNSMOS) that produced the
# reference app's .onnx exports (reference convert_onnx/*.py,
# build-portable/prepare_offline_build.py:21-242), so `state_dict()` keys
# equal the exports' initializer names and `forward()` is torch-primitive
# math written independently of the JAX implementations under test.
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Conv-TasNet (asteroid JorisCos/ConvTasNet_Libri2Mix_sepclean_16k;
# reference convert_onnx/export_convtasnet_onnx.py, overlap_separator.py:70)
# ---------------------------------------------------------------------------

class GlobLN(nn.Module):
    """asteroid gLN: normalize over (C, T) per batch item; affine (1,C,1)."""

    def __init__(self, channels):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(1, channels, 1))
        self.beta = nn.Parameter(torch.zeros(1, channels, 1))

    def forward(self, x):  # [B, C, T]
        mu = x.mean(dim=(1, 2), keepdim=True)
        var = x.var(dim=(1, 2), keepdim=True, unbiased=False)
        return (x - mu) / torch.sqrt(var + 1e-8) * self.gamma + self.beta


class _FreeFB(nn.Module):
    """asteroid free filterbank: _filters [N, 1, L]."""

    def __init__(self, n_filters, kernel):
        super().__init__()
        self._filters = nn.Parameter(
            torch.randn(n_filters, 1, kernel) / math.sqrt(kernel))


class _FbModule(nn.Module):
    def __init__(self, n_filters, kernel):
        super().__init__()
        self.filterbank = _FreeFB(n_filters, kernel)


class Conv1DBlock(nn.Module):
    """asteroid masker TCN block: shared_block Sequential + res/skip convs."""

    def __init__(self, bn, hid, skip, kernel, dilation):
        super().__init__()
        pad = (dilation * (kernel - 1)) // 2
        self.shared_block = nn.Sequential(
            nn.Conv1d(bn, hid, 1), nn.PReLU(), GlobLN(hid),
            nn.Conv1d(hid, hid, kernel, padding=pad, dilation=dilation,
                      groups=hid),
            nn.PReLU(), GlobLN(hid))
        self.res_conv = nn.Conv1d(hid, bn, 1)
        self.skip_conv = nn.Conv1d(hid, skip, 1)

    def forward(self, x):
        y = self.shared_block(x)
        return self.res_conv(y), self.skip_conv(y)


class TorchConvTasNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder = _FbModule(cfg.n_filters, cfg.kernel)
        self.decoder = _FbModule(cfg.n_filters, cfg.kernel)

        class Masker(nn.Module):
            def __init__(self):
                super().__init__()
                self.bottleneck = nn.Sequential(
                    GlobLN(cfg.n_filters),
                    nn.Conv1d(cfg.n_filters, cfg.bottleneck, 1))
                self.TCN = nn.ModuleList([
                    Conv1DBlock(cfg.bottleneck, cfg.hidden, cfg.skip,
                                cfg.conv_kernel, 2 ** (i % cfg.n_blocks))
                    for i in range(cfg.n_repeats * cfg.n_blocks)])
                self.mask_net = nn.Sequential(
                    nn.PReLU(),
                    nn.Conv1d(cfg.skip, cfg.n_src * cfg.n_filters, 1))

        self.masker = Masker()

    def forward(self, mix):  # [B, T] with (T - L) % stride == 0
        cfg = self.cfg
        w = F.relu(F.conv1d(mix[:, None, :], self.encoder.filterbank._filters,
                            stride=cfg.stride))            # [B, N, F]
        h = self.masker.bottleneck(w)
        skip = 0.0
        for blk in self.masker.TCN:
            res, sk = blk(h)
            h = h + res
            skip = skip + sk
        m = self.masker.mask_net(skip)                      # [B, S*N, F]
        b, _, fr = m.shape
        masks = F.relu(m.view(b, cfg.n_src, cfg.n_filters, fr))
        src = w[:, None] * masks                            # [B, S, N, F]
        dec = self.decoder.filterbank._filters              # [N, 1, L]
        out = F.conv_transpose1d(
            src.reshape(b * cfg.n_src, cfg.n_filters, fr), dec,
            stride=cfg.stride)
        return out.view(b, cfg.n_src, -1)


# ---------------------------------------------------------------------------
# PyanNet (pyannote.audio Community-1 segmentation;
# reference core/speaker_diarization_pure_ort.py:441-446)
# ---------------------------------------------------------------------------

class _SincConv(nn.Module):
    """asteroid_filterbanks ParamSincFB / mravanelli SincNet front-end:
    learnable (low_hz_, band_hz_), filters built on the fly."""

    def __init__(self, n_filters, kernel, sample_rate=16000,
                 min_low_hz=30.0, min_band_hz=50.0, stride=10):
        super().__init__()
        self.kernel = kernel
        self.stride = stride
        self.sample_rate = sample_rate
        self.min_low_hz = min_low_hz
        self.min_band_hz = min_band_hz
        low_hz = 30.0
        high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)
        mel = np.linspace(2595 * np.log10(1 + low_hz / 700),
                          2595 * np.log10(1 + high_hz / 700), n_filters + 1)
        hz = 700 * (10 ** (mel / 2595) - 1)
        self.low_hz_ = nn.Parameter(
            torch.tensor(hz[:-1, None], dtype=torch.float32))
        self.band_hz_ = nn.Parameter(
            torch.tensor(np.diff(hz)[:, None], dtype=torch.float32))
        n = (kernel - 1) // 2
        self.register_buffer(
            "n_", 2 * math.pi * torch.arange(-n, 0.0) / sample_rate,
            persistent=False)
        # Symmetric Hamming (np.hamming), matching the JAX model. NOTE:
        # torch.hamming_window defaults to periodic=True; upstream sinc
        # implementations vary on this sub-detail. It only affects real-
        # weight parity, for which the authoritative oracle is executing the
        # real export graph (the filter construction is traced into it).
        self.register_buffer(
            "window_",
            torch.hamming_window(kernel, periodic=False)[:n],
            persistent=False)

    def forward(self, x):  # [B, 1, T]
        low = self.min_low_hz + torch.abs(self.low_hz_)
        high = torch.clamp(low + self.min_band_hz + torch.abs(self.band_hz_),
                           self.min_low_hz, self.sample_rate / 2)
        band = (high - low)[:, 0]
        # n_ = 2π·t; band-pass left half = (sin(2π·high·t) − sin(2π·low·t))
        #            / (2π·t / 2) · hamming
        ft_low = torch.matmul(low, self.n_[None, :])
        ft_high = torch.matmul(high, self.n_[None, :])
        left = ((torch.sin(ft_high) - torch.sin(ft_low))
                / (self.n_[None, :] / 2)) * self.window_[None, :]
        center = 2 * band.view(-1, 1)
        filters = torch.cat([left, center, left.flip(dims=[1])], dim=1)
        filters = filters / (2 * band.view(-1, 1) + 1e-8)
        return F.conv1d(x, filters.view(-1, 1, self.kernel),
                        stride=self.stride)


class TorchPyanNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg

        class SincNet(nn.Module):
            def __init__(self):
                super().__init__()
                self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
                self.conv1d = nn.ModuleList([
                    _SincConv(cfg.sinc_filters, cfg.sinc_kernel,
                              cfg.sample_rate, cfg.min_low_hz,
                              cfg.min_band_hz, cfg.sinc_stride),
                    nn.Conv1d(cfg.sinc_filters, cfg.conv_channels,
                              cfg.conv_kernel),
                    nn.Conv1d(cfg.conv_channels, cfg.conv_channels,
                              cfg.conv_kernel)])
                self.pool1d = nn.ModuleList(
                    [nn.MaxPool1d(cfg.pool, cfg.pool) for _ in range(3)])
                self.norm1d = nn.ModuleList([
                    nn.InstanceNorm1d(cfg.sinc_filters, affine=True),
                    nn.InstanceNorm1d(cfg.conv_channels, affine=True),
                    nn.InstanceNorm1d(cfg.conv_channels, affine=True)])

            def forward(self, wav):  # [B, 1, T]
                x = self.wav_norm1d(wav)
                for c, (conv, pool, norm) in enumerate(
                        zip(self.conv1d, self.pool1d, self.norm1d)):
                    x = conv(x)
                    if c == 0:
                        x = torch.abs(x)
                    x = F.leaky_relu(norm(pool(x)))
                return x

        self.sincnet = SincNet()
        self.lstm = nn.LSTM(cfg.conv_channels, cfg.lstm_hidden,
                            num_layers=cfg.lstm_layers, bidirectional=True,
                            batch_first=True)
        self.linear = nn.ModuleList([
            nn.Linear(2 * cfg.lstm_hidden, cfg.linear_dim),
            nn.Linear(cfg.linear_dim, cfg.linear_dim)])
        self.classifier = nn.Linear(cfg.linear_dim, cfg.num_classes)

    def forward(self, wav):  # [B, T]
        x = self.sincnet(wav[:, None, :])       # [B, C, T']
        x = x.transpose(1, 2)                   # [B, T', C]
        x, _ = self.lstm(x)
        for lin in self.linear:
            x = F.leaky_relu(lin(x))
        return F.log_softmax(self.classifier(x), dim=-1)


def state_dict_to_onnx(module: nn.Module, path, extra=None):
    """Write a module's state_dict as ONNX initializers (the importer's
    input format — torch.onnx.export keeps state-dict names for weights)."""
    from sherpa_vietnamese_asr_tpu.models.onnx_synth import GraphBuilder
    b = GraphBuilder()
    for k, v in module.state_dict().items():
        b.init(k, v.detach().numpy())
    for k, v in (extra or {}).items():
        b.init(k, np.asarray(v))
    data = b.build()
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data
