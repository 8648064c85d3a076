"""Minimal flatten_dict shim (tuple + dot reducers) so the reference
package (which imports flatten_dict in env_variants.py) can be driven as a
parity oracle without installing anything."""


def _join(reducer):
  if reducer == "tuple":
    return lambda prefix, k: prefix + (k,) if prefix else (k,)
  if reducer == "dot":
    return lambda prefix, k: f"{prefix}.{k}" if prefix else k
  raise ValueError(reducer)


def flatten(d, reducer="tuple", keep_empty_types=()):
  join = _join(reducer)
  out = {}

  def rec(prefix, v):
    if isinstance(v, dict) and (v or dict not in keep_empty_types):
      if not v:
        return  # dropped empty dict
      for k, vv in v.items():
        rec(join(prefix, k), vv)
    else:
      out[prefix] = v

  if reducer == "tuple":
    for k, v in d.items():
      rec((k,), v)
  else:
    for k, v in d.items():
      rec(k, v)
  return out


def _split(splitter, key):
  if splitter == "tuple":
    return key
  if splitter == "dot":
    return tuple(key.split("."))
  raise ValueError(splitter)


def unflatten(d, splitter="tuple"):
  out = {}
  for key, v in d.items():
    keys = _split(splitter, key)
    cur = out
    for k in keys[:-1]:
      cur = cur.setdefault(k, {})
    cur[keys[-1]] = v
  return out
