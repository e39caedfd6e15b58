"""Build shim for the optional native extension.

Metadata lives in pyproject.toml; this exists only to compile the C
tokenizer (pylda_tpu/native/_fastcorpus.c).  The extension is optional:
if the toolchain is missing the build proceeds and the package falls
back to the pure-Python parser (pylda_tpu/native/__init__.py).
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "pylda_tpu.native._fastcorpus",
            sources=["pylda_tpu/native/_fastcorpus.c"],
            extra_compile_args=["-O3"],
            optional=True,
        )
    ]
)
