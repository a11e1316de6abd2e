"""Flax model modules: UNets, VAEs, CLIP towers, conditioners."""
