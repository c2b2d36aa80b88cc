"""Glimpse raw-data ingest (reference: tapqir/imscroll/__init__.py:4-9)."""

from tapqir_tpu.imscroll.glimpse_reader import (  # noqa: F401
    GlimpseDataset,
    bin_hist,
    read_glimpse,
)
