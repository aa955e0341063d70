"""End-to-end pipeline assembly."""
