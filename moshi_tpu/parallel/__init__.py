from .mesh import make_mesh, shard_params, lm_param_spec  # noqa: F401
