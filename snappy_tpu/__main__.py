import sys

from snappy_tpu.cli.main import main

sys.exit(main())
