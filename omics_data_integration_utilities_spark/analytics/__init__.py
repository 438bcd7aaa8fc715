from .drivernet import (  # noqa: F401
    greedy_driver_selection,
    permutation_null_coverage,
)
