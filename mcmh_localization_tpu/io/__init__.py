from mcmh_localization_tpu.io.pgm import read_pgm, write_pgm, load_map_yaml

__all__ = ["read_pgm", "write_pgm", "load_map_yaml"]
