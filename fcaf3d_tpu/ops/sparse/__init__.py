from .tensor import (  # noqa: F401
    EXTENT,
    SENTINEL,
    SparseTensor,
    downsample_coords,
    encode_coords,
    lookup,
    voxelize,
    voxelize_reduce,
)
from .conv import (  # noqa: F401
    build_kernel_map,
    conv_plan,
    gather_gemm,
    gen_conv_plan,
    generative_transpose_conv2x2,
    interpolate_at,
    kernel_offsets,
    sparse_add_into,
    sparse_conv,
    sparse_union_add,
    sparse_max_pool,
    sparse_prune,
)
