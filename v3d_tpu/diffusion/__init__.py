from v3d_tpu.diffusion.scaling import (
    EDMScaling,
    EpsScaling,
    VScaling,
    VScalingWithEDMcNoise,
)
from v3d_tpu.diffusion.discretize import EDMDiscretization, LegacyDDPMDiscretization
from v3d_tpu.diffusion.guidance import (
    IdentityGuider,
    VanillaCFG,
    LinearPredictionGuider,
    TrianglePredictionGuider,
)
from v3d_tpu.diffusion.sigma_sampling import EDMSampling, DiscreteSampling
from v3d_tpu.diffusion.weighting import (
    UnitWeighting,
    EDMWeighting,
    VWeighting,
    EpsWeighting,
)
from v3d_tpu.diffusion.denoise import Denoiser, DiscreteDenoiser
from v3d_tpu.diffusion.sampling import (
    EulerEDMSampler,
    HeunEDMSampler,
    EulerAncestralSampler,
    DPMPP2SAncestralSampler,
    DPMPP2MSampler,
    LinearMultistepSampler,
    to_d,
)
