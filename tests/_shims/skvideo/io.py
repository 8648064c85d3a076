def vwrite(*args, **kwargs):
  raise NotImplementedError("skvideo stub: video writing unavailable")


class FFmpegWriter:
  def __init__(self, *a, **k):
    raise NotImplementedError("skvideo stub")
