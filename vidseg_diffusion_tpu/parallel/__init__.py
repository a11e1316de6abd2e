"""Device-mesh construction and sharding rules."""

from vidseg_diffusion_tpu.parallel.mesh import make_mesh, runs_sharding

__all__ = ["make_mesh", "runs_sharding"]
