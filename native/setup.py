"""Build the vidseg_native C++ extension:
    cd native && python setup.py build_ext --inplace
(vidseg_diffusion_tpu.io.native builds it on demand and falls back to PIL)."""

from setuptools import Extension, setup

setup(
    name="vidseg_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "vidseg_native",
            sources=["vidseg_native.cpp"],
            libraries=["png", "z"],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
)
