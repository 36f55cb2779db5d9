"""Back-compat shim: the pipeline benchmark is now a first-class package
CLI — ``python -m tokenize_audio_tpu.benchmark --pipeline`` (VERDICT r3
next-round #3). This forwards so old invocations keep working."""

import sys

sys.path.insert(0, ".")

from tokenize_audio_tpu.benchmark import main

if __name__ == "__main__":
    sys.exit(main(["--pipeline"] + sys.argv[1:]))
