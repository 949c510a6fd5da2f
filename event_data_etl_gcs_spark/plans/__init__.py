from .sparkify import (
    build_artists,
    build_songplays,
    build_songs,
    build_time,
    build_users,
    run_pipeline,
)

__all__ = [
    "build_artists",
    "build_songplays",
    "build_songs",
    "build_time",
    "build_users",
    "run_pipeline",
]
