"""Stub of GitPython: the reference imports `git` at module scope
(utils/import_utils.py) but the parity oracle never clones anything."""


class Repo:
  @staticmethod
  def clone_from(*a, **k):
    raise NotImplementedError("git stub: no network in the test sandbox")
