"""QMC sampling: Owen-scrambled low-discrepancy sequences, bokeh
distributions, and device-side sample tables (TPU-native replacement for the
reference's ``Source/Utility/Random.h`` + ``PassGenerator`` sequence
plumbing)."""

from . import bits, bokeh, qmc
from .tables import (
    NUM_RANDOM_SEQUENCES,
    SampleTables,
    build_tables,
    get_aperture_sample,
    get_sequence_value,
    glsl_random,
)

__all__ = [
    "bits",
    "bokeh",
    "qmc",
    "NUM_RANDOM_SEQUENCES",
    "SampleTables",
    "build_tables",
    "get_aperture_sample",
    "get_sequence_value",
    "glsl_random",
]
