"""Engine layer: DiffusionEngine facade + the VidSeg pipeline."""
