"""Import helper for the read-only reference repo (parity tests only).

The reference has stale imports (numpy.lib.type_check, torch.functional
.align_tensors) and pulls torchvision via fid_evaluation; shim those so the
model classes load on modern torch-cpu. Used ONLY to instantiate reference
architectures for numeric parity checks — no reference code ships in the
package.
"""
import sys
import types

import numpy as np

_REFERENCE = "/root/reference"


def import_reference_siren():
    import torch

    shim = types.ModuleType("numpy.lib.type_check")
    shim.imag = np.imag
    sys.modules.setdefault("numpy.lib.type_check", shim)
    if not hasattr(torch.functional, "align_tensors"):
        torch.functional.align_tensors = lambda *a: a
    fe = types.ModuleType("fid_evaluation")
    fe.output_images = None
    sys.modules.setdefault("fid_evaluation", fe)
    if _REFERENCE not in sys.path:
        sys.path.insert(0, _REFERENCE)
    from siren import siren as ref_siren  # noqa: PLC0415

    return ref_siren


def import_reference_discriminators():
    import_reference_siren()  # shared shims/path
    import discriminators.sgdiscriminators as ref_d  # noqa: PLC0415

    return ref_d
