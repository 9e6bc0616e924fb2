"""Optimizers matching the reference's training recipe.

The reference trains with ``torch.optim.Adam(params, lr, weight_decay=wd)``
(gcn1.py fit / profiling_gcn.py:158-160). Torch's Adam applies weight decay as
classic L2 — ``grad += wd * param`` *before* the moment updates — which is
optax ``add_decayed_weights`` placed *before* ``scale_by_adam`` (optax's
``adamw`` decays after, i.e. decoupled, and would not match).
"""

from __future__ import annotations

import optax


def adam_l2(lr: float = 0.01, weight_decay: float = 5e-4,
            b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    steps = []
    if weight_decay:
        steps.append(optax.add_decayed_weights(weight_decay))
    steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    steps.append(optax.scale(-lr))
    return optax.chain(*steps)
