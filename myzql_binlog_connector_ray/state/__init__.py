"""Checkpoint manifests and exactly-once commit helpers."""
