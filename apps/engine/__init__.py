from apps.engine.engine import VideoDepthEngine  # noqa: F401
