from .optim import (HyperOptimizer, default_search_space,  # noqa: F401
                    gan_search_space)
