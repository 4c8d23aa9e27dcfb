from hyperbolic_vae_tpu.data import cifar10, jerby_arnon, mnist
from hyperbolic_vae_tpu.data.core import ArrayDataModule, split_three_way, split_train_val

__all__ = [
    "ArrayDataModule",
    "split_train_val",
    "split_three_way",
    "mnist",
    "cifar10",
    "jerby_arnon",
]
