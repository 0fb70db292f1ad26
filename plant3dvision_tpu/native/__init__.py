"""Native C++ geometry module (role of the reference's romicgal: the
C++/CGAL component). Provides marching cubes surface extraction and mesh
utilities via a ctypes-loaded shared library built from native/geometry.cpp.

Build:  python -m plant3dvision_tpu.native.build
"""

from .mc import marching_cubes, native_available

__all__ = ["marching_cubes", "native_available"]
