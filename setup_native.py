"""Build the native C++ extension:  python setup_native.py build_ext --inplace"""
from setuptools import Extension, setup

setup(
    name="neurips2023_soc_tpu_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "neurips2023_soc_tpu_native",
            sources=["native/rle.cpp"],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ],
)
