from . import schema, compiler, camera, tracer, render  # noqa: F401
