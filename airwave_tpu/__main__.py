import sys

from airwave_tpu.shell.app import install_cli_signal_handlers, main

if __name__ == "__main__":
    install_cli_signal_handlers()
    sys.exit(main())
