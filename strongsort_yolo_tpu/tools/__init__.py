"""Operational CLIs: MOT evaluation, training, offline postprocess."""
