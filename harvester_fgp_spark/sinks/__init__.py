"""Sinks S4-S6: normalized records, checkpoint/lineage, resume filter."""
