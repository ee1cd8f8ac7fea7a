import sys

from airwave_tpu.shell.app import cli

if __name__ == "__main__":
    sys.exit(cli())
