"""L5 CLI: the `tpusnappy` command-line tool (python -m snappy_tpu.cli).

Shape follows the reference CLI (cmd/snappy/: subcommand registry, table
output, exit-code contract, root-error mapping — SURVEY.md §1):
compress / decompress / verify / info / bench subcommands, atomic output
writes (tmp+rename, the reference's AtomicWriteFile discipline), and the
sentinel-error → exit-code mapping from snappy_tpu.errors.
"""

from snappy_tpu.cli.main import main  # noqa: F401
