"""Re-export: the shim lives in the package so the checkpoint-converter CLI
can unpickle whole-module reference checkpoints (see compat/reference_shim)."""
from fenerf_tpu.compat.reference_shim import (  # noqa: F401
    import_reference_discriminators,
    import_reference_generators,
    import_reference_siren,
)
