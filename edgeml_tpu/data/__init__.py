from .io import (
    list_image_names,
    load_data,
    set_data,
    load_feature,
    extract_output_feature,
    V5_STAGE_NAMES,
)

__all__ = [
    "list_image_names",
    "load_data",
    "set_data",
    "load_feature",
    "extract_output_feature",
    "V5_STAGE_NAMES",
]
