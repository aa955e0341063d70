"""Checkpoint store: partition manifests + lineage."""
