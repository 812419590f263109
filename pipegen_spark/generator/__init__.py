"""Synthetic data generation + traffic shaping (reference B6/B7/B8)."""
