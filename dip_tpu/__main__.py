from dip_tpu.cli.main import main

main()
