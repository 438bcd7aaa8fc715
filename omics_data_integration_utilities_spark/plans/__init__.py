from .mass_annotation import mass_annotation_plan, default_adducts  # noqa: F401
