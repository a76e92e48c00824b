import os


def walk_paths(path: str, exts: tuple[str, ...]) -> list[str]:
    """Deterministic (sorted) listing of files with the given suffixes
    under ``path`` — or ``[path]`` itself when it's a file. Shared by
    the JSONL and WARC sources so the walk semantics (sorted dirs,
    sorted files, file-vs-dir branch) can never diverge."""
    if os.path.isfile(path):
        return [path]
    out = []
    for dirpath, dirs, files in os.walk(path):
        dirs.sort()
        out.extend(
            os.path.join(dirpath, f)
            for f in sorted(files)
            if f.endswith(exts)
        )
    return out


from textindex_ray.sources.files import read_file_corpus  # noqa: E402,F401
