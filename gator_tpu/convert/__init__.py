from .torch_loader import (convert_checkpoint, convert_state_dict,
                           export_state_dict, load_torch_checkpoint)

__all__ = ["convert_checkpoint", "convert_state_dict",
           "export_state_dict", "load_torch_checkpoint"]
