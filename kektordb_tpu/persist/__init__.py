from .resp import format_command, parse_command  # noqa: F401
from .aof import AOFWriter, LazyAOFWriter, read_frames, FrameError  # noqa: F401
