"""Order-based torchvision state_dict import.

torchvision checkpoints cannot be verified key-by-key in this image (the
package is absent), but torch state_dicts preserve module-definition order —
which these JAX models mirror. The importer walks a model's parameters in
definition order as typed SLOTS and consumes the state_dict's tensors in
order, transforming per kind and shape-checking each assignment loudly:

  conv    OIHW -> HWIO (groups handled: torch stores (O, I/g, kH, kW))
  bn      weight, bias, running_mean, running_var (num_batches_tracked skipped)
  gn      weight, bias
  vec     1-D tensor as-is (biases)
  linear  (out, in) -> (in, out)
  skip    slot exists here but not in torch (e.g. a conv bias under a norm
          layer) — left at its initialized value, consumes nothing

A shape mismatch raises with the slot path and position, so a divergence
from the real torchvision layout fails fast instead of silently corrupting
weights. Roundtrip mechanics are covered by tests; true torchvision ordering
is documented as best-effort (docs/DIVERGENCES.md item 9).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class OrderedImporter:
    def __init__(self, sd: dict):
        self.items = [
            (k, np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v))
            for k, v in sd.items()
            if not k.endswith("num_batches_tracked")
        ]
        self.pos = 0

    def _next(self, path: str, want_shape):
        if self.pos >= len(self.items):
            raise ValueError(f"state_dict exhausted at slot {path}")
        key, val = self.items[self.pos]
        if tuple(val.shape) != tuple(want_shape):
            raise ValueError(
                f"slot {path}: expected shape {tuple(want_shape)}, state_dict "
                f"tensor #{self.pos} '{key}' has {tuple(val.shape)}"
            )
        self.pos += 1
        return val

    def conv(self, path: str, hwio_array):
        h, w, i, o = hwio_array.shape
        v = self._next(path, (o, i, h, w))
        return jnp.asarray(v.transpose(2, 3, 1, 0))

    def vec(self, path: str, array):
        return jnp.asarray(self._next(path, array.shape))

    def linear(self, path: str, in_out_array):
        i, o = in_out_array.shape
        return jnp.asarray(self._next(path, (o, i)).T)

    def linear_chw(self, path: str, in_out_array, chw: tuple):
        """Linear whose torch input is a flattened (C, H, W) feature map while
        this model flattens NHWC maps (H, W, C)-major: permute the input axis
        accordingly. chw = the torch-side (C, H, W) shape."""
        c, h, w = chw
        i, o = in_out_array.shape
        v = self._next(path, (o, i))
        v = v.reshape(o, c, h, w).transpose(0, 2, 3, 1).reshape(o, i)
        return jnp.asarray(v.T)

    def bn(self, path: str, g, b, m, v):
        return (
            self.vec(path + ".weight", g),
            self.vec(path + ".bias", b),
            self.vec(path + ".running_mean", m),
            self.vec(path + ".running_var", v),
        )

    def done(self):
        if self.pos != len(self.items):
            leftovers = [k for k, _ in self.items[self.pos : self.pos + 5]]
            raise ValueError(
                f"state_dict has {len(self.items) - self.pos} unconsumed "
                f"tensors, starting at {leftovers}"
            )


def import_convbn(imp: OrderedImporter, path: str, p: dict, s: dict):
    """A Conv2dNormActivation unit: conv (no bias) + BN."""
    p = dict(p)
    s = dict(s)
    p["w"] = imp.conv(path + ".conv", p["w"])
    p["g"], p["b"], s["m"], s["v"] = imp.bn(path + ".bn", p["g"], p["b"], s["m"], s["v"])
    return p, s


def import_frozen_convbn(imp: OrderedImporter, path: str, p: dict):
    """Conv + FrozenBatchNorm packed in one dict (resnet layout)."""
    p = dict(p)
    p["w"] = imp.conv(path + ".conv", p["w"])
    p["g"], p["b"], p["m"], p["v"] = imp.bn(path + ".bn", p["g"], p["b"], p["m"], p["v"])
    return p
