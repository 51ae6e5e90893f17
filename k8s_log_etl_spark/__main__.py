from k8s_log_etl_spark.cli import main

raise SystemExit(main())
