from tpumap.index.build import GenomeDB, build_db  # noqa: F401
