"""Datasets + evaluation harnesses (MOT-format sequences, synthetic)."""
