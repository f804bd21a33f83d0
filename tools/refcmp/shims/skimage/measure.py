def marching_cubes(*args, **kwargs):
    raise ValueError(
        "skimage shim: marching_cubes is not available in the comparison "
        "sandbox (meshing is disabled for the head-to-head run)")


# old-API name probed by the reference's version check (Mesher.py:437-446)
marching_cubes_lewiner = marching_cubes
