from hyperbolic_vae_tpu.models.autoencoder import Autoencoder
from hyperbolic_vae_tpu.models.vae_euclidean import ConvDecoder, ConvEncoder, EuclideanVAE
from hyperbolic_vae_tpu.models.vae_gyroplane import GyroplaneVAE
from hyperbolic_vae_tpu.models.vae_hyperbolic import HyperbolicImageVAE
from hyperbolic_vae_tpu.models.vae_pvae import PvaeMLPVAE
from hyperbolic_vae_tpu.models.vae_rnaseq import RNASeqVAE
from hyperbolic_vae_tpu.models.vae_unified import VAE, UnifiedVAE

__all__ = [
    "Autoencoder",
    "EuclideanVAE",
    "ConvEncoder",
    "ConvDecoder",
    "GyroplaneVAE",
    "HyperbolicImageVAE",
    "RNASeqVAE",
    "PvaeMLPVAE",
    "UnifiedVAE",
    "VAE",
]
