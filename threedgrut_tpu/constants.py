"""Numerical constants shared by all renderers.

These mirror the reference semantics documented in SURVEY.md Appendix B
(reference: threedgrt_tracer/include/3dgrt/kernels/cuda/gaussianParticles.cuh:242-283,
threedgut_tracer/include/3dgut/threedgut.cuh:20-92, configs/render/*.yaml) so that
images and gradients can be compared allclose against the reference CUDA build.
"""

# Generalized-Gaussian kernel response scale: response = exp(s_n * d^(n/2)) with
# s_n = -4.5 / 3^n for degree n (d = squared canonical min distance).
# Degree 0 is a linear falloff; the constants below are the exact reference values.
GG_SCALE = {
    0: -0.329630334487,  # linear: max(1 + s*sqrt(d), 0)
    1: -1.5,
    2: -0.5,
    3: -0.166666666667,
    4: -0.0555555555556,
    5: -0.0185185185185,
    8: -0.000685871056241,
}

# SH basis constants (same as the standard real-SH constants used by 3DGS).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

# Hit acceptance / compositing thresholds.
MIN_KERNEL_RESPONSE = 0.0113      # particle_kernel_min_response
MIN_ALPHA = 1.0 / 255.0           # particle_kernel_min_alpha
MAX_ALPHA = 0.99                  # particle_kernel_max_alpha
MIN_TRANSMITTANCE_3DGRT = 0.001
MIN_TRANSMITTANCE_3DGRT_EVAL = 0.03
MIN_TRANSMITTANCE_3DGUT = 0.0001
MAX_PARTICLE_SQ_DISTANCE = 9.0    # canonical-space slab test bound
K_HITS_PER_TRACE = 16             # 3DGRT per-segment hit buffer depth
# Per-ray odd-even re-sort passes in the fast bundle compositor — matches
# the reference's per-ray sorted k=16 hit window (referenceOptix.cu:210-248:
# hits more than 16 positions out of order are approximated there too).
GRT_SORTED_PASSES = 16

# Default kernel degrees.
KERNEL_DEGREE_3DGRT = 4
KERNEL_DEGREE_3DGUT = 2

# Tiling (3DGUT rasterizer).
TILE_X = 16
TILE_Y = 16
TILE_SIZE = TILE_X * TILE_Y

# Unscented-transform parameters.
UT_ALPHA = 1.0
UT_BETA = 2.0
UT_KAPPA = 0.0
UT_D = 3
UT_IMAGE_MARGIN = 0.1
UT_REQUIRE_ALL_SIGMA_POINTS = False
N_ROLLING_SHUTTER_ITERATIONS = 5

# Projector parameters.
MIN_SENSOR_Z = 0.2
COVARIANCE_DILATION = 0.3
MIP_SPLATTING_SCALING = True
TIGHT_OPACITY_BOUNDING = True
RECT_BOUNDING = True
MAX_EXTENT_SIGMA = 3.33
MIN_PROJ_LAMBDA = 0.01
