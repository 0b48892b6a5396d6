from .checkpoint import RunManifest, checkpoint_df  # noqa: F401
