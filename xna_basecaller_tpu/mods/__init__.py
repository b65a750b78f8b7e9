"""Modified-base calling (the reference's Remora hook, re-designed).

The reference delegates mod calling to the external `remora` package
(ub-bonito/bonito/mod_util.py): a per-site classifier over signal +
sequence context, attached to the basecall pipeline, emitting SAM MM/ML
tags.  Remora is a torch/CUDA stack with downloadable ONT models —
neither exists here — so this package implements the same subsystem
TPU-native:

- `mods.model`: a small JAX conv+MLP classifier over a fixed signal
  window and one-hot sequence context (static shapes, batched, jittable).
- `mods.infer`: move-table -> seq-to-signal mapping, motif-site feature
  extraction, `call_mods` with MM/ML tag emission (SAMtags spec 1.7).
- `mods.train`: a compact fit loop so models can be trained from ctc-data
  or Taiyaki-style chunk dumps (no downloadable weights in this env).
"""

from xna_basecaller_tpu.mods.infer import call_mods, mods_tags_to_str
from xna_basecaller_tpu.mods.model import (
    ModsConfig, init_mods_params, load_mods_model, mods_forward,
    save_mods_model,
)
