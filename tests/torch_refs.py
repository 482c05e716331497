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


# ---------------------------------------------------------------------------
# CAM++ (3D-Speaker speech_campplus_sv_zh_en_16k-common_advanced; the
# reference's own exporter convert_onnx/export_campplus_onnx.py embeds the
# upstream module tree this mirrors)
# ---------------------------------------------------------------------------

class _BnRelu(nn.Module):
    """get_nonlinear('batchnorm-relu') / ('batchnorm_'): Sequential with a
    child named 'batchnorm' (and ReLU)."""

    def __init__(self, channels, affine=True, relu=True, two_d=False):
        super().__init__()
        bn = (nn.BatchNorm2d if two_d else nn.BatchNorm1d)(
            channels, affine=affine)
        self.batchnorm = bn
        self._relu = relu

    def forward(self, x):
        x = self.batchnorm(x)
        return F.relu(x) if self._relu else x


class _CamLayer(nn.Module):
    def __init__(self, bn_ch, out_ch, kernel, dilation, seg_len=100):
        super().__init__()
        pad = (kernel - 1) // 2 * dilation
        self.linear_local = nn.Conv1d(bn_ch, out_ch, kernel, padding=pad,
                                      dilation=dilation, bias=False)
        self.linear1 = nn.Conv1d(bn_ch, bn_ch // 2, 1)
        self.linear2 = nn.Conv1d(bn_ch // 2, out_ch, 1)
        self.seg_len = seg_len

    def forward(self, x):  # [B, C, T]
        y = self.linear_local(x)
        seg = F.avg_pool1d(x, self.seg_len, self.seg_len, ceil_mode=True)
        seg = seg.unsqueeze(-1).expand(*seg.shape, self.seg_len)
        seg = seg.reshape(*seg.shape[:-2], -1)[..., : x.shape[-1]]
        ctx = x.mean(-1, keepdim=True) + seg
        gate = torch.sigmoid(self.linear2(F.relu(self.linear1(ctx))))
        return y * gate


class _CamDenseLayer(nn.Module):
    def __init__(self, in_ch, growth, bn_ch, kernel, dilation):
        super().__init__()
        self.nonlinear1 = _BnRelu(in_ch)
        self.linear1 = nn.Conv1d(in_ch, bn_ch, 1, bias=False)
        self.nonlinear2 = _BnRelu(bn_ch)
        self.cam_layer = _CamLayer(bn_ch, growth, kernel, dilation)

    def forward(self, x):
        return self.cam_layer(self.nonlinear2(
            self.linear1(self.nonlinear1(x))))


class _FcmBlock(nn.Module):
    def __init__(self, c_in, c_out, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, c_out, 3, (stride, 1), 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_out)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_out)
        self.shortcut = nn.Sequential()
        if stride != 1 or c_in != c_out:
            self.shortcut = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, (stride, 1), bias=False),
                nn.BatchNorm2d(c_out))

    def forward(self, x):
        out = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x)))))
        return F.relu(out + self.shortcut(x))


class TorchCampp(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        mc = cfg.m_channels

        class Head(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(1, mc, 3, 1, 1, bias=False)
                self.bn1 = nn.BatchNorm2d(mc)
                self.layer1 = nn.Sequential(_FcmBlock(mc, mc, 2),
                                            _FcmBlock(mc, mc, 1))
                self.layer2 = nn.Sequential(_FcmBlock(mc, mc, 2),
                                            _FcmBlock(mc, mc, 1))
                self.conv2 = nn.Conv2d(mc, mc, 3, (2, 1), 1, bias=False)
                self.bn2 = nn.BatchNorm2d(mc)

            def forward(self, x):  # [B, F, T]
                x = x.unsqueeze(1)
                x = F.relu(self.bn1(self.conv1(x)))
                x = self.layer2(self.layer1(x))
                x = F.relu(self.bn2(self.conv2(x)))
                b, c, f, t = x.shape
                return x.reshape(b, c * f, t)

        self.head = Head()
        fcm_out = mc * (cfg.num_mels // 8)
        bn_ch = cfg.bn_size * cfg.growth_rate

        class Tdnn(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Conv1d(fcm_out, cfg.init_channels, 5,
                                        stride=2, padding=2, bias=False)
                self.nonlinear = _BnRelu(cfg.init_channels)

            def forward(self, x):
                return self.nonlinear(self.linear(x))

        class Transit(nn.Module):
            def __init__(self, c_in, c_out):
                super().__init__()
                self.nonlinear = _BnRelu(c_in)
                self.linear = nn.Conv1d(c_in, c_out, 1, bias=False)

            def forward(self, x):
                return self.linear(self.nonlinear(x))

        class Dense(nn.Module):
            def __init__(self, c_in, c_out):
                super().__init__()
                self.linear = nn.Conv1d(c_in, c_out, 1, bias=False)
                self.nonlinear = _BnRelu(c_out, affine=False, relu=False)

            def forward(self, x):  # [B, C]
                x = self.linear(x.unsqueeze(-1)).squeeze(-1)
                return self.nonlinear(x)

        xv = nn.Module()
        xv.tdnn = Tdnn()
        c = cfg.init_channels
        for i, (n_layers, dil) in enumerate(zip(cfg.block_layers,
                                                cfg.dilations)):
            block = nn.Module()
            for j in range(n_layers):
                setattr(block, f"tdnnd{j + 1}",
                        _CamDenseLayer(c, cfg.growth_rate, bn_ch,
                                       cfg.kernel, dil))
                c += cfg.growth_rate
            setattr(xv, f"block{i + 1}", block)
            setattr(xv, f"transit{i + 1}", Transit(c, c // 2))
            c //= 2
        xv.out_nonlinear = _BnRelu(c)
        xv.dense = Dense(2 * c, cfg.embed_dim)
        self.xvector = xv
        self._final_c = c

    def forward(self, feats):  # [B, T, F] -> [B, embed]
        cfg = self.cfg
        x = self.head(feats.permute(0, 2, 1))
        xv = self.xvector
        x = xv.tdnn(x)
        for i in range(len(cfg.block_layers)):
            block = getattr(xv, f"block{i + 1}")
            for j in range(cfg.block_layers[i]):
                layer = getattr(block, f"tdnnd{j + 1}")
                x = torch.cat([x, layer(x)], dim=1)
            x = getattr(xv, f"transit{i + 1}")(x)
        x = xv.out_nonlinear(x)
        # 3D-Speaker statistics_pooling: mean + UNBIASED std over time
        mean = x.mean(dim=-1)
        std = x.std(dim=-1, unbiased=True)
        return xv.dense(torch.cat([mean, std], dim=-1))


# ---------------------------------------------------------------------------
# ResNet34 speaker embedding frame encoder (wespeaker-voxceleb-resnet34-LM as
# wrapped by pyannote Community-1; reference convert_onnx/
# split_pyannote_embedding.py extracts the encoder + resnet.seg_1 Gemm)
# ---------------------------------------------------------------------------

class _WsBlock(nn.Module):
    def __init__(self, c_in, c_out, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_out)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_out)
        self.shortcut = nn.Sequential()
        if stride != 1 or c_in != c_out:
            self.shortcut = nn.Sequential(
                nn.Conv2d(c_in, c_out, 1, stride, bias=False),
                nn.BatchNorm2d(c_out))

    def forward(self, x):
        out = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x)))))
        return F.relu(out + self.shortcut(x))


class TorchResNetSpeaker(nn.Module):
    """Frame-feature encoder half of the split export: [B, T, 80] fbank ->
    [B, C*F', T'] frame features (the tensor at /resnet/pool/Reshape)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg

        class ResNet(nn.Module):
            def __init__(self):
                super().__init__()
                bc = cfg.base_channels
                self.conv1 = nn.Conv2d(1, bc, 3, 1, 1, bias=False)
                self.bn1 = nn.BatchNorm2d(bc)
                c_in = bc
                for stage, n_blocks in enumerate(cfg.blocks):
                    c_out = bc * (2 ** stage)
                    blocks = []
                    for b in range(n_blocks):
                        stride = 2 if (stage > 0 and b == 0) else 1
                        blocks.append(_WsBlock(c_in, c_out, stride))
                        c_in = c_out
                    setattr(self, f"layer{stage + 1}",
                            nn.Sequential(*blocks))
                self.seg_1 = nn.Linear(2 * cfg.frame_feature_dim,
                                       cfg.embed_dim)

        self.resnet = ResNet()

    def forward(self, fbank):  # [B, T, F]
        x = fbank.permute(0, 2, 1).unsqueeze(1)  # [B, 1, F, T]
        r = self.resnet
        x = F.relu(r.bn1(r.conv1(x)))
        for stage in range(len(self.cfg.blocks)):
            x = getattr(r, f"layer{stage + 1}")(x)
        b, c, f, t = x.shape
        return x.reshape(b, c * f, t)


def randomize_bn_stats(module: nn.Module, seed=0):
    """Give BatchNorm running stats non-trivial values so parity tests
    exercise the mean/var name mapping (fresh modules have mean 0, var 1)."""
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5


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
