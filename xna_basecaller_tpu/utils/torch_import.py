"""Import reference PyTorch checkpoints (weights_N.tar) into param trees.

The reference distributes pretrained models as torch state_dicts over its
encoder Serial (reference: ub-bonito/bonito/nn.py layer structure; key
names like ``encoder.0.conv.weight`` ... ``encoder.9.linear.bias``; the
name/shape-matching loader at util.py:242-258).  This maps them onto this
framework's pytree layout:

  conv  : torch Conv1d weight [out, in, k]  -> ours [k, in, out]
  lstm  : weight_ih_l0 [4H, in] -> w_ih [in, 4H] (same torch gate order
          i,f,g,o); weight_hh_l0 [4H, H] -> w_hh [H, 4H]; bias_ih_l0 ->
          bias; bias_hh_l0 is frozen-zero in the reference and dropped
  head  : Linear weight [out, in] -> w [in, out]; bias -> b
          (optional linear_ext the same way)

The mapping is structural (sorted indices), so DataParallel ``module.``
prefixes and renamed Serials load the same way the reference's
match_names does.
"""

from __future__ import annotations

import re

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def import_state_dict(state_dict: dict, cfg) -> dict:
    """torch state_dict -> this framework's param tree for ``cfg``."""
    clean = {re.sub(r"^module\.", "", k): _to_numpy(v)
             for k, v in state_dict.items()}

    # group by the Serial index: encoder.<i>.<rest>
    groups: dict[int, dict[str, np.ndarray]] = {}
    for k, v in clean.items():
        m = re.match(r"encoder\.(\d+)\.(.+)$", k)
        if not m:
            continue
        groups.setdefault(int(m.group(1)), {})[m.group(2)] = v

    convs = []
    rnns = []
    head = {}
    head_ext = {}
    for idx in sorted(groups):
        g = groups[idx]
        if "conv.weight" in g:
            w = g["conv.weight"]           # [out, in, k]
            convs.append({
                "w": np.transpose(w, (2, 1, 0)).astype(np.float32),
                "b": g["conv.bias"].astype(np.float32),
            })
        elif "rnn.weight_ih_l0" in g:
            rnns.append({
                "w_ih": g["rnn.weight_ih_l0"].T.astype(np.float32),
                "w_hh": g["rnn.weight_hh_l0"].T.astype(np.float32),
                "bias": g["rnn.bias_ih_l0"].astype(np.float32),
            })
        elif "linear.weight" in g:
            head = {
                "w": g["linear.weight"].T.astype(np.float32),
                "b": g["linear.bias"].astype(np.float32),
            }
            if "linear_ext.weight" in g:
                head_ext = {
                    "w": g["linear_ext.weight"].T.astype(np.float32),
                    "b": g["linear_ext.bias"].astype(np.float32),
                }

    if not convs or not rnns or not head:
        raise ValueError(
            "state_dict does not look like a reference CRF encoder "
            f"(convs={len(convs)}, rnns={len(rnns)}, head={bool(head)})")
    if len(rnns) != cfg.encoder.num_rnn_layers:
        raise ValueError(
            f"checkpoint has {len(rnns)} LSTM layers, config expects "
            f"{cfg.encoder.num_rnn_layers}")

    params = {"conv": convs, "rnn": rnns, "head": head}
    if head_ext:
        params["head_ext"] = head_ext
    return params


def load_torch_checkpoint(path: str, cfg) -> dict:
    """Load a reference weights_N.tar into a param tree."""
    import torch

    state_dict = torch.load(path, map_location="cpu")
    return import_state_dict(state_dict, cfg)
