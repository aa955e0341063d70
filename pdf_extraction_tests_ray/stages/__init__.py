"""Ray Data map_batches stages."""
