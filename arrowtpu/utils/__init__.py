"""Aux utilities: pretty printing, metrics/memory accounting, data gen."""

from . import datagen, metrics, pretty
from .metrics import Metrics, TrackingMemoryPool, buffer_memory_size
from .pretty import pretty_format_batches, print_batches
