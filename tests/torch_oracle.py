"""Independent PyTorch oracle of the RN architecture, per SURVEY.md's spec.

The reference mount is empty (SURVEY.md section 0), so golden parity is
established against a from-spec torch implementation (SURVEY.md section 4
item 2): conv->BN->ReLU x4 stride 2; embedding + LSTM final hidden; literal
pair expansion with question concat at the injection position; sum-pool;
f_phi; log-softmax. Weight-transplant helpers map torch state_dicts onto the
flax param pytree.

CPU torch only; used exclusively by tests.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleConv(nn.Module):
    def __init__(self, channels=(24, 24, 24, 24), in_ch=3, k=3, stride=2):
        super().__init__()
        self.convs = nn.ModuleList()
        self.bns = nn.ModuleList()
        c_prev = in_ch
        for c in channels:
            self.convs.append(nn.Conv2d(c_prev, c, k, stride=stride, padding=k // 2))
            self.bns.append(nn.BatchNorm2d(c, eps=1e-5, momentum=0.1))
            c_prev = c

    def forward(self, x):  # (B, 3, S, S)
        for conv, bn in zip(self.convs, self.bns):
            x = F.relu(bn(conv(x)))
        return x


class OracleText(nn.Module):
    """Embedding(pad=0) + LSTM; mask-aware final state (rnet semantics)."""

    def __init__(self, vocab, emb, hidden):
        super().__init__()
        self.emb = nn.Embedding(vocab, emb, padding_idx=0)
        self.lstm = nn.LSTM(emb, hidden, batch_first=True)

    def forward(self, tokens):  # (B, T) long
        x = self.emb(tokens)
        out, _ = self.lstm(x)  # (B, T, H)
        # state at the last non-pad position per row (mask-aware carry is
        # equivalent when pads are trailing; tests use trailing-pad inputs)
        lengths = (tokens != 0).sum(1).clamp(min=1)
        idx = (lengths - 1).view(-1, 1, 1).expand(-1, 1, out.size(-1))
        return out.gather(1, idx).squeeze(1)


class OracleRelational(nn.Module):
    def __init__(self, obj_dim, q_dim, g_layers, f_layers, n_answers, inject, dropout):
        super().__init__()
        self.inject = inject
        self.g = nn.ModuleList()
        d = 2 * obj_dim
        for l, width in enumerate(g_layers):
            d_in = d + (q_dim if l == inject else 0)
            self.g.append(nn.Linear(d_in, width))
            d = width
        self.f = nn.ModuleList()
        for width in f_layers:
            self.f.append(nn.Linear(d, width))
            d = width
        self.f_out = nn.Linear(d, n_answers)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x, q):  # (B, n, c), (B, h)
        B, n, c = x.shape
        xi = x.unsqueeze(2).expand(B, n, n, c)  # slot 1: index i
        xj = x.unsqueeze(1).expand(B, n, n, c)  # slot 2: index j
        a = torch.cat([xi, xj], -1).reshape(B, n * n, 2 * c)
        for l, lin in enumerate(self.g):
            if l == self.inject:
                qb = q.unsqueeze(1).expand(B, n * n, q.size(-1))
                a = torch.cat([a, qb], -1)
            a = F.relu(lin(a))
        y = a.sum(1)
        for lin in self.f:
            y = F.relu(lin(y))
        y = self.dropout(y)
        return F.log_softmax(self.f_out(y), dim=-1)


class OracleRN(nn.Module):
    def __init__(self, cfg, vocab_size):
        super().__init__()
        self.cfg = cfg
        self.state_description = cfg.state_description
        if not cfg.state_description:
            self.conv = OracleConv(cfg.conv_channels, 3, cfg.conv_kernel, cfg.conv_stride)
        self.text = OracleText(vocab_size, cfg.lstm_word_emb, cfg.lstm_hidden)
        self.rel = OracleRelational(
            cfg.obj_feat_dim,
            cfg.lstm_hidden,
            cfg.g_layers,
            cfg.f_layers,
            cfg.n_answers,
            cfg.question_injection_position,
            cfg.dropout,
        )

    def forward(self, inputs, tokens):
        if self.state_description:
            objs = inputs
        else:
            x = self.conv(inputs)  # (B, C, g, g)
            B, C, g, _ = x.shape
            # NCHW -> (B, g*g, C) row-major over (row, col), matching rnet's
            # NHWC reshape
            objs = x.permute(0, 2, 3, 1).reshape(B, g * g, C)
            lin = torch.linspace(-1, 1, g)
            cy, cx = torch.meshgrid(lin, lin, indexing="ij")
            coords = torch.stack([cx.reshape(-1), cy.reshape(-1)], -1)
            objs = torch.cat([objs, coords.unsqueeze(0).expand(B, -1, -1)], -1)
        q = self.text(tokens)
        return self.rel(objs, q)


# ---- weight transplant: torch -> flax param pytree ----


def _t(x):
    return np.asarray(x.detach().cpu().numpy())


def conv_params(oracle: OracleConv):
    params, stats = {}, {}
    for i, (conv, bn) in enumerate(zip(oracle.convs, oracle.bns)):
        params[f"conv{i}"] = {
            "kernel": _t(conv.weight).transpose(2, 3, 1, 0),
            "bias": _t(conv.bias),
        }
        params[f"bn{i}"] = {"scale": _t(bn.weight), "bias": _t(bn.bias)}
        stats[f"bn{i}"] = {"mean": _t(bn.running_mean), "var": _t(bn.running_var)}
    return params, stats


def text_params(oracle: OracleText):
    return {
        "embedding": _t(oracle.emb.weight),
        "wx": _t(oracle.lstm.weight_ih_l0).T,
        "wh": _t(oracle.lstm.weight_hh_l0).T,
        "b": _t(oracle.lstm.bias_ih_l0) + _t(oracle.lstm.bias_hh_l0),
    }


def relational_params(oracle: OracleRelational):
    p = {}
    for l, lin in enumerate(oracle.g):
        p[f"g{l}_kernel"] = _t(lin.weight).T
        p[f"g{l}_bias"] = _t(lin.bias)
    for l, lin in enumerate(oracle.f):
        p[f"f{l}_kernel"] = _t(lin.weight).T
        p[f"f{l}_bias"] = _t(lin.bias)
    n = len(oracle.f)
    p[f"f{n}_kernel"] = _t(oracle.f_out.weight).T
    p[f"f{n}_bias"] = _t(oracle.f_out.bias)
    return p


def rn_variables(oracle: OracleRN):
    """Full flax variables dict {params, batch_stats} for rnet.models.RN."""
    params = {
        "text": text_params(oracle.text),
        "relational": relational_params(oracle.rel),
    }
    batch_stats = {}
    if not oracle.state_description:
        cp, cs = conv_params(oracle.conv)
        params["conv"] = cp
        batch_stats["conv"] = cs
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
