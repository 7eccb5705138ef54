from .dataset import get_dataset  # noqa: F401
