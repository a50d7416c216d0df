"""gdal_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the *semantics* of GDAL's raster/vector
core (reference: yorickdewid/gdal @ /root/reference, v3.12.0) expressed as
idiomatic Ray Data pipelines: ``ray.data.Dataset`` → ``map_batches`` over
zero-copy Arrow batches, actor pools for stateful stages, groupby/aggregate
for the wide steps.

Nothing here links to or wraps GDAL; tile math, geometry predicates, image
codecs, resampling kernels and checksums are all reimplemented in pure
numpy / stdlib from the documented behavior of the reference (file:line
citations in each module's docstring).
"""

__version__ = "0.1.0"
