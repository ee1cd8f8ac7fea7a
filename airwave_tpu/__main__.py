import sys

from airwave_tpu.shell.app import main

if __name__ == "__main__":
    sys.exit(main())
