from shmr_spark.compat.cli import main

if __name__ == "__main__":
    main()
