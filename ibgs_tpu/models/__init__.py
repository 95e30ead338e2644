from ibgs_tpu.models.gaussians import GaussianModel, GaussianParams
