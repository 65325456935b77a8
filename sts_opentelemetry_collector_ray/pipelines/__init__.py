from .flagship import FlagshipResult, flagship_run, routed_dataset

__all__ = ["FlagshipResult", "flagship_run", "routed_dataset"]
