"""Interop with the reference PyTorch implementation: import trained
torch checkpoints (Lightning .ckpt / raw state_dict / portable .npz)
into this framework's flax parameter trees."""

from hyperbolic_vae_tpu.interop.torch_export import (  # noqa: F401
    export_torch_state_dict,
)
from hyperbolic_vae_tpu.interop.torch_import import (  # noqa: F401
    import_torch_state_dict,
    load_torch_state_dict,
)
