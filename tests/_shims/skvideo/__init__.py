"""Stub of scikit-video: just enough for `import skvideo.io` at reference
module import time (the parity oracle never writes videos)."""
